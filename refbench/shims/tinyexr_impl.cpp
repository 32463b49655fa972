// From-spec scanline OpenEXR reader behind the tinyexr LoadEXR API.
// Mirrors mcpt_tpu/utils/image.py:read_exr (the repo's own Python
// codec); PIZ chunks decode through mcpt_tpu/native/piz.c.
#include "tinyexr.h"

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>

extern "C" int piz_uncompress(const uint8_t *in, long in_len, int n_channels,
                              const int *nx, const int *ny, uint16_t *out,
                              long out_count);

namespace
{

const char *dup_err(const std::string &msg)
{
    char *m = static_cast<char *>(std::malloc(msg.size() + 1));
    std::memcpy(m, msg.c_str(), msg.size() + 1);
    return m;
}

float half_to_float(uint16_t h)
{
    uint32_t sign = (uint32_t)(h >> 15) << 31;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0)
    {
        if (mant == 0)
            bits = sign;
        else
        {
            // subnormal half -> normalized float
            int e = -1;
            do
            {
                ++e;
                mant <<= 1;
            } while (!(mant & 0x400));
            bits = sign | ((127 - 15 - e) << 23) | ((mant & 0x3FF) << 13);
        }
    }
    else if (exp == 31)
        bits = sign | 0x7F800000u | (mant << 13);
    else
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

// EXR ZIP: zlib inflate, un-interleave odd/even halves, undo the +-128
// byte delta predictor (image.py:_exr_unpack).
bool zip_unpack(const uint8_t *payload, size_t n, size_t expect,
                std::vector<uint8_t> *out)
{
    out->resize(expect);
    if (n == expect)
    {
        std::memcpy(out->data(), payload, n);
        return true;
    }
    std::vector<uint8_t> tmp(expect);
    uLongf dst_len = expect;
    if (uncompress(tmp.data(), &dst_len, payload, n) != Z_OK ||
        dst_len != expect)
        return false;
    std::vector<uint8_t> inter(expect);
    size_t half = (expect + 1) / 2;
    for (size_t i = 0, j = 0; i < half; ++i, j += 2)
        inter[j] = tmp[i];
    for (size_t i = half, j = 1; i < expect; ++i, j += 2)
        inter[j] = tmp[i];
    uint8_t prev = inter[0];
    (*out)[0] = prev;
    for (size_t i = 1; i < expect; ++i)
    {
        prev = (uint8_t)(prev + inter[i] - 128);
        (*out)[i] = prev;
        // note: matches the int arithmetic mod 256 of the spec
    }
    return true;
}

} // namespace

extern "C" int LoadEXR(float **out_rgba, int *width, int *height,
                       const char *filename, const char **err)
{
    FILE *f = std::fopen(filename, "rb");
    if (!f)
    {
        if (err)
            *err = dup_err(std::string("cannot open '") + filename + "'");
        return TINYEXR_ERROR_CANT_OPEN_FILE;
    }
    std::fseek(f, 0, SEEK_END);
    long flen = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> data(flen);
    if (std::fread(data.data(), 1, flen, f) != (size_t)flen)
    {
        std::fclose(f);
        if (err)
            *err = dup_err("short read");
        return TINYEXR_ERROR_INVALID_DATA;
    }
    std::fclose(f);

    auto fail = [&](const std::string &m) {
        if (err)
            *err = dup_err(m);
        return TINYEXR_ERROR_INVALID_DATA;
    };

    if (flen < 8 || *(uint32_t *)data.data() != 0x01312F76u)
        return fail("not an EXR file");

    size_t pos = 8;
    std::map<std::string, std::vector<uint8_t>> attrs;
    while (pos < data.size() && data[pos] != 0)
    {
        size_t e = pos;
        while (data[e])
            ++e;
        std::string name((char *)&data[pos], e - pos);
        pos = e + 1;
        e = pos;
        while (data[e])
            ++e;
        pos = e + 1;
        int32_t size;
        std::memcpy(&size, &data[pos], 4);
        pos += 4;
        attrs[name] = std::vector<uint8_t>(&data[pos], &data[pos + size]);
        pos += size;
    }
    pos += 1;

    if (!attrs.count("dataWindow") || !attrs.count("compression") ||
        !attrs.count("channels"))
        return fail("missing EXR header attributes");
    int32_t dw[4];
    std::memcpy(dw, attrs["dataWindow"].data(), 16);
    int w = dw[2] - dw[0] + 1, h = dw[3] - dw[1] + 1;
    int comp = attrs["compression"][0];
    if (comp != 0 && comp != 2 && comp != 3 && comp != 4)
        return fail("EXR compression " + std::to_string(comp) +
                    " unsupported (none/ZIPS/ZIP/PIZ only)");
    int block = comp == 0 ? 1 : (comp == 2 ? 1 : (comp == 3 ? 16 : 32));

    struct Chan
    {
        std::string name;
        int type; // 1 = half, 2 = float
    };
    std::vector<Chan> chans;
    {
        const std::vector<uint8_t> &cl = attrs["channels"];
        size_t cpos = 0;
        while (cpos < cl.size() && cl[cpos] != 0)
        {
            size_t e = cpos;
            while (cl[e])
                ++e;
            std::string cname((char *)&cl[cpos], e - cpos);
            cpos = e + 1;
            int32_t ctype;
            std::memcpy(&ctype, &cl[cpos], 4);
            cpos += 16;
            chans.push_back({cname, ctype});
        }
    }
    int nc = (int)chans.size();
    if (nc == 0)
        return fail("no channels");

    int n_chunks = (h + block - 1) / block;
    std::vector<uint64_t> offsets(n_chunks);
    std::memcpy(offsets.data(), &data[pos], 8 * n_chunks);

    std::map<std::string, std::vector<float>> planes;
    for (const Chan &c : chans)
        planes[c.name] = std::vector<float>((size_t)w * h, 0.0f);

    for (int ci = 0; ci < n_chunks; ++ci)
    {
        size_t off = offsets[ci];
        int32_t y, size;
        std::memcpy(&y, &data[off], 4);
        std::memcpy(&size, &data[off + 4], 4);
        const uint8_t *payload = &data[off + 8];
        int rows = block < (dw[3] - y + 1) ? block : (dw[3] - y + 1);

        if (comp == 4)
        { // PIZ (half channels only — matches the repo's decoder)
            for (const Chan &c : chans)
                if (c.type != 1)
                    return fail("PIZ with float32 channels unsupported");
            std::vector<int> nx(nc, w), ny(nc, rows);
            std::vector<uint16_t> out((size_t)nc * w * rows);
            int ret = piz_uncompress(payload, size, nc, nx.data(), ny.data(),
                                     out.data(), (long)out.size());
            if (ret != 0)
                return fail("PIZ decode failed: " + std::to_string(ret));
            for (int c = 0; c < nc; ++c)
            {
                const uint16_t *src = &out[(size_t)c * w * rows];
                float *dst = &planes[chans[c].name][(size_t)(y - dw[1]) * w];
                for (long i = 0; i < (long)w * rows; ++i)
                    dst[i] = half_to_float(src[i]);
            }
            continue;
        }

        size_t rowbytes = 0;
        for (const Chan &c : chans)
            rowbytes += (size_t)w * (c.type == 1 ? 2 : 4);
        size_t expect = rowbytes * rows;
        std::vector<uint8_t> raw;
        if (!zip_unpack(payload, size, expect, &raw))
            return fail("ZIP decode failed");
        size_t rpos = 0;
        for (int r = 0; r < rows; ++r)
            for (const Chan &c : chans)
            {
                float *dst = &planes[c.name][(size_t)(y - dw[1] + r) * w];
                if (c.type == 1)
                {
                    for (int i = 0; i < w; ++i)
                    {
                        uint16_t v;
                        std::memcpy(&v, &raw[rpos + 2 * i], 2);
                        dst[i] = half_to_float(v);
                    }
                    rpos += (size_t)w * 2;
                }
                else
                {
                    std::memcpy(dst, &raw[rpos], (size_t)w * 4);
                    rpos += (size_t)w * 4;
                }
            }
    }

    float *rgba = static_cast<float *>(
        std::malloc(sizeof(float) * 4 * (size_t)w * h));
    bool has_rgb = planes.count("R") && planes.count("G") && planes.count("B");
    const std::vector<float> &R = has_rgb ? planes["R"] : planes[chans[0].name];
    const std::vector<float> &G = has_rgb ? planes["G"] : planes[chans[0].name];
    const std::vector<float> &B = has_rgb ? planes["B"] : planes[chans[0].name];
    const std::vector<float> *A =
        planes.count("A") ? &planes["A"] : nullptr;
    for (size_t i = 0, n = (size_t)w * h; i < n; ++i)
    {
        rgba[4 * i + 0] = R[i];
        rgba[4 * i + 1] = G[i];
        rgba[4 * i + 2] = B[i];
        rgba[4 * i + 3] = A ? (*A)[i] : 1.0f;
    }
    *out_rgba = rgba;
    *width = w;
    *height = h;
    return TINYEXR_SUCCESS;
}

extern "C" void FreeEXRErrorMessage(const char *err)
{
    std::free(const_cast<char *>(err));
}
