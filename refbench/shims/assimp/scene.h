// Minimal assimp-compatible OBJ importer for the refbench harness (the
// benchmark host has no assimp install and nothing may be installed).
// Covers exactly what csrt's model_loader.cpp touches: Importer::
// ReadFile/GetErrorString, aiScene{mFlags,mRootNode,mMeshes}, aiNode,
// aiMesh{mFaces,mVertices,mNormals,mTangents,mBitangents,
// mTextureCoords[0]}, aiFace, and the aiProcess flags Triangulate /
// GenSmoothNormals / FlipUVs (GenUVCoords and CalcTangentSpace are
// accepted and ignored: the reference rebuilds tangent frames itself
// when the importer supplies none, csrt src/rtcore/scene.cpp:63-102).
// OBJ only — every benchmark mesh (dragon, classroom, dining-room) is
// OBJ; matpreview.serialized uses csrt's own zlib reader.
#pragma once

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <string>
#include <vector>

#define AI_SCENE_FLAGS_INCOMPLETE 0x1

enum aiPostProcessSteps
{
    aiProcess_Triangulate = 0x8,
    aiProcess_GenSmoothNormals = 0x40,
    aiProcess_FlipUVs = 0x800000,
    aiProcess_GenUVCoords = 0x40000,
    aiProcess_CalcTangentSpace = 0x1,
};

struct aiVector3D
{
    float x = 0.0f, y = 0.0f, z = 0.0f;
};

struct aiFace
{
    unsigned int mIndices[3] = {0, 0, 0};
};

struct aiMesh
{
    unsigned int mNumFaces = 0;
    unsigned int mNumVertices = 0;
    std::vector<aiFace> faces_;
    std::vector<aiVector3D> verts_;
    std::vector<aiVector3D> norms_;
    std::vector<aiVector3D> uvs_;
    aiFace *mFaces = nullptr;
    aiVector3D *mVertices = nullptr;
    aiVector3D *mNormals = nullptr;
    aiVector3D *mTangents = nullptr;
    aiVector3D *mBitangents = nullptr;
    aiVector3D *mTextureCoords[8] = {nullptr};

    void finalize()
    {
        mNumFaces = static_cast<unsigned int>(faces_.size());
        mNumVertices = static_cast<unsigned int>(verts_.size());
        mFaces = faces_.data();
        mVertices = verts_.data();
        mNormals = norms_.empty() ? nullptr : norms_.data();
        mTextureCoords[0] = uvs_.empty() ? nullptr : uvs_.data();
    }
};

struct aiNode
{
    unsigned int mNumMeshes = 0;
    unsigned int *mMeshes = nullptr;
    unsigned int mNumChildren = 0;
    aiNode **mChildren = nullptr;
    std::vector<unsigned int> mesh_ids_;
};

struct aiScene
{
    unsigned int mFlags = 0;
    aiNode *mRootNode = nullptr;
    aiMesh **mMeshes = nullptr;
    aiNode root_;
    aiMesh mesh_;
    aiMesh *mesh_ptr_ = nullptr;
};

namespace assimp_shim
{

struct ObjIndex
{
    int v, vt, vn;
    bool operator<(const ObjIndex &o) const
    {
        if (v != o.v)
            return v < o.v;
        if (vt != o.vt)
            return vt < o.vt;
        return vn < o.vn;
    }
};

inline bool load_obj(const std::string &filename, unsigned int flags,
                     aiScene *scene, std::string *err)
{
    std::ifstream f(filename);
    if (!f)
    {
        *err = "cannot open '" + filename + "'";
        return false;
    }
    std::vector<aiVector3D> vs, vts, vns;
    aiMesh &mesh = scene->mesh_;
    std::map<ObjIndex, unsigned int> remap;
    std::string line;
    std::vector<unsigned int> poly;

    auto resolve = [](int idx, size_t count) -> int {
        if (idx > 0)
            return idx - 1;
        if (idx < 0)
            return static_cast<int>(count) + idx;
        return -1;
    };

    while (std::getline(f, line))
    {
        const char *s = line.c_str();
        while (*s == ' ' || *s == '\t')
            ++s;
        if (s[0] == 'v' && s[1] == ' ')
        {
            aiVector3D p;
            std::sscanf(s + 2, "%f %f %f", &p.x, &p.y, &p.z);
            vs.push_back(p);
        }
        else if (s[0] == 'v' && s[1] == 't')
        {
            aiVector3D p;
            std::sscanf(s + 3, "%f %f", &p.x, &p.y);
            if (flags & aiProcess_FlipUVs)
                p.y = 1.0f - p.y;
            vts.push_back(p);
        }
        else if (s[0] == 'v' && s[1] == 'n')
        {
            aiVector3D p;
            std::sscanf(s + 3, "%f %f %f", &p.x, &p.y, &p.z);
            vns.push_back(p);
        }
        else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t'))
        {
            poly.clear();
            const char *p = s + 1;
            while (*p)
            {
                while (*p == ' ' || *p == '\t')
                    ++p;
                if (!*p || *p == '\r' || *p == '\n' || *p == '#')
                    break;
                ObjIndex oi{0, 0, 0};
                char *end = nullptr;
                oi.v = resolve((int)std::strtol(p, &end, 10), vs.size());
                p = end;
                if (*p == '/')
                {
                    ++p;
                    if (*p != '/')
                    {
                        oi.vt = resolve((int)std::strtol(p, &end, 10),
                                        vts.size());
                        p = end;
                    }
                    else
                        oi.vt = -1;
                    if (*p == '/')
                    {
                        ++p;
                        oi.vn = resolve((int)std::strtol(p, &end, 10),
                                        vns.size());
                        p = end;
                    }
                    else
                        oi.vn = -1;
                }
                else
                {
                    oi.vt = -1;
                    oi.vn = -1;
                }
                if (oi.v < 0 || oi.v >= (int)vs.size())
                {
                    *err = "bad vertex index in '" + filename + "'";
                    return false;
                }
                auto it = remap.find(oi);
                unsigned int id;
                if (it != remap.end())
                    id = it->second;
                else
                {
                    id = (unsigned int)mesh.verts_.size();
                    remap.emplace(oi, id);
                    mesh.verts_.push_back(vs[oi.v]);
                    if (oi.vt >= 0 && oi.vt < (int)vts.size())
                        mesh.uvs_.push_back(vts[oi.vt]);
                    else if (!vts.empty())
                        mesh.uvs_.push_back(aiVector3D());
                    if (oi.vn >= 0 && oi.vn < (int)vns.size())
                        mesh.norms_.push_back(vns[oi.vn]);
                    else if (!vns.empty())
                        mesh.norms_.push_back(aiVector3D());
                }
                poly.push_back(id);
            }
            // triangulate fan (aiProcess_Triangulate)
            for (size_t k = 2; k < poly.size(); ++k)
            {
                aiFace face;
                face.mIndices[0] = poly[0];
                face.mIndices[1] = poly[k - 1];
                face.mIndices[2] = poly[k];
                mesh.faces_.push_back(face);
            }
        }
        // o/g/s/usemtl/mtllib/# ignored: one flattened mesh
    }

    if (mesh.verts_.empty() || mesh.faces_.empty())
    {
        *err = "no geometry in '" + filename + "'";
        return false;
    }

    // aiProcess_GenSmoothNormals: area-weighted vertex normals when the
    // file supplies none (assimp's default smoothing config for OBJ)
    if (mesh.norms_.empty() && (flags & aiProcess_GenSmoothNormals))
    {
        mesh.norms_.assign(mesh.verts_.size(), aiVector3D());
        for (const aiFace &face : mesh.faces_)
        {
            const aiVector3D &a = mesh.verts_[face.mIndices[0]];
            const aiVector3D &b = mesh.verts_[face.mIndices[1]];
            const aiVector3D &c = mesh.verts_[face.mIndices[2]];
            float ux = b.x - a.x, uy = b.y - a.y, uz = b.z - a.z;
            float wx = c.x - a.x, wy = c.y - a.y, wz = c.z - a.z;
            aiVector3D n{uy * wz - uz * wy, uz * wx - ux * wz,
                         ux * wy - uy * wx};
            for (int j = 0; j < 3; ++j)
            {
                aiVector3D &t = mesh.norms_[face.mIndices[j]];
                t.x += n.x;
                t.y += n.y;
                t.z += n.z;
            }
        }
        for (aiVector3D &t : mesh.norms_)
        {
            float l = std::sqrt(t.x * t.x + t.y * t.y + t.z * t.z);
            if (l > 1e-20f)
            {
                t.x /= l;
                t.y /= l;
                t.z /= l;
            }
            else
                t.z = 1.0f;
        }
    }

    mesh.finalize();
    scene->mesh_ptr_ = &scene->mesh_;
    scene->mMeshes = &scene->mesh_ptr_;
    scene->root_.mesh_ids_ = {0};
    scene->root_.mMeshes = scene->root_.mesh_ids_.data();
    scene->root_.mNumMeshes = 1;
    scene->mRootNode = &scene->root_;
    return true;
}

} // namespace assimp_shim
