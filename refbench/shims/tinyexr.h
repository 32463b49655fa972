// Minimal tinyexr-compatible LoadEXR for the refbench harness (the host
// has no tinyexr and nothing may be installed).  Backed by a from-spec
// scanline OpenEXR reader (tinyexr_impl.cpp): compression none/ZIPS/ZIP
// (zlib) and PIZ (mcpt_tpu/native/piz.c, this repo's own from-spec
// Huffman+wavelet decoder), half/float channels — covers envmap.exr
// (PIZ half RGB) and the shipped Tungsten ground truths.
#pragma once

#define TINYEXR_SUCCESS (0)
#define TINYEXR_ERROR_CANT_OPEN_FILE (-3)
#define TINYEXR_ERROR_INVALID_DATA (-4)

#ifdef __cplusplus
extern "C" {
#endif

int LoadEXR(float **out_rgba, int *width, int *height, const char *filename,
            const char **err);
void FreeEXRErrorMessage(const char *err);

#ifdef __cplusplus
}
#endif
