// Native host-side I/O + preprocessing for deepatlas_tpu.
//
// The reference's host data path runs inside SimpleITK's C++ (NIfTI read,
// resampling, normalization — lib/datasets.py:117-121, lib/transforms.py:
// 9-68).  That wheel is absent here and the Python fallback (gzip + numpy)
// is the ingest bottleneck on small hosts, so this library provides the
// native tier: zlib-inflated NIfTI-1 reading with dtype conversion and
// scl_slope/scl_inter application, trilinear resampling to a target grid,
// and zero-mean/unit-variance normalization with clamping.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).  Build:
//   g++ -O3 -shared -fPIC -o libdeepatlas_io.so deepatlas_io.cpp -lz
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

// ----------------------------------------------------------------- gzip

bool read_file(const char* path, std::vector<uint8_t>& out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out.resize(static_cast<size_t>(n));
    size_t got = std::fread(out.data(), 1, out.size(), f);
    std::fclose(f);
    return got == out.size();
}

bool gunzip(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 15 + 32) != Z_OK) return false;  // gzip or zlib
    zs.next_in = const_cast<uint8_t*>(in.data());
    zs.avail_in = static_cast<uInt>(in.size());
    out.clear();
    out.reserve(in.size() * 4);
    uint8_t buf[1 << 16];
    int ret = Z_OK;
    while (ret != Z_STREAM_END) {
        zs.next_out = buf;
        zs.avail_out = sizeof(buf);
        ret = inflate(&zs, Z_NO_FLUSH);
        if (ret != Z_OK && ret != Z_STREAM_END) {
            inflateEnd(&zs);
            return false;
        }
        out.insert(out.end(), buf, buf + (sizeof(buf) - zs.avail_out));
    }
    inflateEnd(&zs);
    return true;
}

// -------------------------------------------------------------- nifti-1

#pragma pack(push, 1)
struct Nifti1Header {
    int32_t sizeof_hdr;
    char unused1[35];
    char dim_info;
    int16_t dim[8];
    float intent_p1, intent_p2, intent_p3;
    int16_t intent_code;
    int16_t datatype;
    int16_t bitpix;
    int16_t slice_start;
    float pixdim[8];
    float vox_offset;
    float scl_slope;
    float scl_inter;
    int16_t slice_end;
    char slice_code;
    char xyzt_units;
    float cal_max, cal_min;
    float slice_duration, toffset;
    int32_t glmax, glmin;
    char descrip[80];
    char aux_file[24];
    int16_t qform_code, sform_code;
    float quatern_b, quatern_c, quatern_d;
    float qoffset_x, qoffset_y, qoffset_z;
    float srow_x[4], srow_y[4], srow_z[4];
    char intent_name[16];
    char magic[4];
};
#pragma pack(pop)

static_assert(sizeof(Nifti1Header) == 348, "NIfTI-1 header must be 348 B");

template <typename T>
void convert_to_f32(const uint8_t* src, float* dst, size_t n, float slope,
                    float inter) {
    const T* s = reinterpret_cast<const T*>(src);
    if (slope == 0.0f) slope = 1.0f;
    if (slope == 1.0f && inter == 0.0f) {
        for (size_t i = 0; i < n; ++i) dst[i] = static_cast<float>(s[i]);
    } else {
        for (size_t i = 0; i < n; ++i)
            dst[i] = static_cast<float>(s[i]) * slope + inter;
    }
}

}  // namespace

extern "C" {

// Reads header info: dims[0..7], pixdim[0..7]; returns 0 on success.
int da_nifti_header(const char* path, int32_t* dims, float* pixdim,
                    int32_t* datatype) {
    std::vector<uint8_t> raw, data;
    if (!read_file(path, raw)) return 1;
    const std::vector<uint8_t>* p = &raw;
    if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
        if (!gunzip(raw, data)) return 2;
        p = &data;
    }
    if (p->size() < sizeof(Nifti1Header)) return 3;
    Nifti1Header h;
    std::memcpy(&h, p->data(), sizeof(h));
    if (h.sizeof_hdr != 348) return 4;  // non-native endianness unsupported
    for (int i = 0; i < 8; ++i) {
        dims[i] = h.dim[i];
        pixdim[i] = h.pixdim[i];
    }
    *datatype = h.datatype;
    return 0;
}

// Reads voxels as float32 into out (size = prod(dims[1..ndim])), C-order
// with x fastest (NIfTI layout) — the caller views it as (z, y, x).
// Also writes spacing (sx, sy, sz) and the 4x4 sform affine (row-major,
// identity-from-pixdim if sform_code == 0).  Returns 0 on success.
int da_nifti_read_f32(const char* path, float* out, int64_t out_len,
                      float* spacing, float* affine) {
    std::vector<uint8_t> raw, data;
    if (!read_file(path, raw)) return 1;
    const std::vector<uint8_t>* p = &raw;
    if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
        if (!gunzip(raw, data)) return 2;
        p = &data;
    }
    if (p->size() < sizeof(Nifti1Header)) return 3;
    Nifti1Header h;
    std::memcpy(&h, p->data(), sizeof(h));
    if (h.sizeof_hdr != 348) return 4;

    int ndim = h.dim[0];
    if (ndim < 3 || ndim > 5) return 5;
    int64_t n = 1;
    for (int i = 1; i <= ndim; ++i) n *= (h.dim[i] > 0 ? h.dim[i] : 1);
    if (n != out_len) return 6;

    size_t off = static_cast<size_t>(h.vox_offset);
    if (off < 348 || off + n * (h.bitpix / 8) > p->size()) return 7;
    const uint8_t* vox = p->data() + off;

    switch (h.datatype) {
        case 2: convert_to_f32<uint8_t>(vox, out, n, h.scl_slope,
                                        h.scl_inter); break;
        case 4: convert_to_f32<int16_t>(vox, out, n, h.scl_slope,
                                        h.scl_inter); break;
        case 8: convert_to_f32<int32_t>(vox, out, n, h.scl_slope,
                                        h.scl_inter); break;
        case 16: convert_to_f32<float>(vox, out, n, h.scl_slope,
                                       h.scl_inter); break;
        case 64: convert_to_f32<double>(vox, out, n, h.scl_slope,
                                        h.scl_inter); break;
        case 256: convert_to_f32<int8_t>(vox, out, n, h.scl_slope,
                                         h.scl_inter); break;
        case 512: convert_to_f32<uint16_t>(vox, out, n, h.scl_slope,
                                           h.scl_inter); break;
        case 768: convert_to_f32<uint32_t>(vox, out, n, h.scl_slope,
                                           h.scl_inter); break;
        default: return 8;
    }

    spacing[0] = h.pixdim[1];
    spacing[1] = h.pixdim[2];
    spacing[2] = h.pixdim[3];
    if (h.sform_code > 0) {
        for (int j = 0; j < 4; ++j) {
            affine[0 * 4 + j] = h.srow_x[j];
            affine[1 * 4 + j] = h.srow_y[j];
            affine[2 * 4 + j] = h.srow_z[j];
        }
        affine[12] = affine[13] = affine[14] = 0.0f;
        affine[15] = 1.0f;
    } else {
        std::memset(affine, 0, 16 * sizeof(float));
        affine[0] = h.pixdim[1];
        affine[5] = h.pixdim[2];
        affine[10] = h.pixdim[3];
        affine[15] = 1.0f;
    }
    return 0;
}

// Writes a float32 (or uint8 when as_uint8) volume as .nii.gz; dims are
// (nx, ny, nz) with x fastest in `data`.  Returns 0 on success.
int da_nifti_write(const char* path, const float* data, int32_t nx,
                   int32_t ny, int32_t nz, const float* spacing,
                   int as_uint8) {
    Nifti1Header h;
    std::memset(&h, 0, sizeof(h));
    h.sizeof_hdr = 348;
    h.dim[0] = 3;
    h.dim[1] = static_cast<int16_t>(nx);
    h.dim[2] = static_cast<int16_t>(ny);
    h.dim[3] = static_cast<int16_t>(nz);
    for (int i = 4; i < 8; ++i) h.dim[i] = 1;
    h.datatype = as_uint8 ? 2 : 16;
    h.bitpix = as_uint8 ? 8 : 32;
    h.pixdim[0] = 1.0f;
    h.pixdim[1] = spacing ? spacing[0] : 1.0f;
    h.pixdim[2] = spacing ? spacing[1] : 1.0f;
    h.pixdim[3] = spacing ? spacing[2] : 1.0f;
    h.vox_offset = 352.0f;
    h.scl_slope = 1.0f;
    h.sform_code = 1;
    h.srow_x[0] = h.pixdim[1];
    h.srow_y[1] = h.pixdim[2];
    h.srow_z[2] = h.pixdim[3];
    std::memcpy(h.magic, "n+1\0", 4);

    int64_t n = static_cast<int64_t>(nx) * ny * nz;
    std::vector<uint8_t> payload(352 + n * (as_uint8 ? 1 : 4), 0);
    std::memcpy(payload.data(), &h, sizeof(h));
    if (as_uint8) {
        uint8_t* d = payload.data() + 352;
        for (int64_t i = 0; i < n; ++i)
            d[i] = static_cast<uint8_t>(std::fmax(0.f,
                                                  std::fmin(255.f, data[i])));
    } else {
        std::memcpy(payload.data() + 352, data, n * 4);
    }

    gzFile g = gzopen(path, "wb");
    if (!g) return 1;
    int wrote = gzwrite(g, payload.data(),
                        static_cast<unsigned>(payload.size()));
    gzclose(g);
    return wrote == static_cast<int>(payload.size()) ? 0 : 2;
}

// Trilinear resample src (sz, sy, sx — z slowest) to dst (dz, dy, dx),
// sampling at the centers of the target grid mapped into the source grid
// by the spacing ratio (SimpleITK Resample capability for axis-aligned
// volumes, lib/transforms.py:9-57).
void da_resample_trilinear(const float* src, int32_t sx, int32_t sy,
                           int32_t sz, float* dst, int32_t dx, int32_t dy,
                           int32_t dz) {
    const double rx = static_cast<double>(sx) / dx;
    const double ry = static_cast<double>(sy) / dy;
    const double rz = static_cast<double>(sz) / dz;
    for (int z = 0; z < dz; ++z) {
        double fz = (z + 0.5) * rz - 0.5;
        int z0 = static_cast<int>(std::floor(fz));
        double tz = fz - z0;
        int z0c = z0 < 0 ? 0 : (z0 >= sz ? sz - 1 : z0);
        int z1c = z0 + 1 < 0 ? 0 : (z0 + 1 >= sz ? sz - 1 : z0 + 1);
        for (int y = 0; y < dy; ++y) {
            double fy = (y + 0.5) * ry - 0.5;
            int y0 = static_cast<int>(std::floor(fy));
            double ty = fy - y0;
            int y0c = y0 < 0 ? 0 : (y0 >= sy ? sy - 1 : y0);
            int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= sy ? sy - 1 : y0 + 1);
            const float* p00 = src + (static_cast<int64_t>(z0c) * sy + y0c) * sx;
            const float* p01 = src + (static_cast<int64_t>(z0c) * sy + y1c) * sx;
            const float* p10 = src + (static_cast<int64_t>(z1c) * sy + y0c) * sx;
            const float* p11 = src + (static_cast<int64_t>(z1c) * sy + y1c) * sx;
            float* row = dst + (static_cast<int64_t>(z) * dy + y) * dx;
            for (int x = 0; x < dx; ++x) {
                double fx = (x + 0.5) * rx - 0.5;
                int x0 = static_cast<int>(std::floor(fx));
                double tx = fx - x0;
                int x0c = x0 < 0 ? 0 : (x0 >= sx ? sx - 1 : x0);
                int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= sx ? sx - 1 : x0 + 1);
                double v00 = p00[x0c] * (1 - tx) + p00[x1c] * tx;
                double v01 = p01[x0c] * (1 - tx) + p01[x1c] * tx;
                double v10 = p10[x0c] * (1 - tx) + p10[x1c] * tx;
                double v11 = p11[x0c] * (1 - tx) + p11[x1c] * tx;
                double v0 = v00 * (1 - ty) + v01 * ty;
                double v1 = v10 * (1 - ty) + v11 * ty;
                row[x] = static_cast<float>(v0 * (1 - tz) + v1 * tz);
            }
        }
    }
}

// Zero-mean/unit-variance normalize in place, then optional clamp
// (Normalization + SitkToTensor clamp, lib/transforms.py:59-92).
void da_normalize(float* data, int64_t n, int clamp01) {
    double mean = 0.0;
    for (int64_t i = 0; i < n; ++i) mean += data[i];
    mean /= static_cast<double>(n);
    double var = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double d = data[i] - mean;
        var += d * d;
    }
    var /= static_cast<double>(n);
    float inv = static_cast<float>(1.0 / std::sqrt(var + 1e-12));
    float mu = static_cast<float>(mean);
    if (clamp01) {
        for (int64_t i = 0; i < n; ++i) {
            float v = (data[i] - mu) * inv;
            data[i] = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
        }
    } else {
        for (int64_t i = 0; i < n; ++i) data[i] = (data[i] - mu) * inv;
    }
}


// Nearest-neighbour resample (for label masks: SimpleITK Resample with a
// nearest interpolator — our documented divergence from the reference,
// which runs *linear* interpolation on the segmentation too,
// lib/transforms.py:42-55, blending label ids).
void da_resample_nearest(const float* src, int32_t sx, int32_t sy,
                         int32_t sz, float* dst, int32_t dx, int32_t dy,
                         int32_t dz) {
    const double rx = static_cast<double>(sx) / dx;
    const double ry = static_cast<double>(sy) / dy;
    const double rz = static_cast<double>(sz) / dz;
    for (int z = 0; z < dz; ++z) {
        int zi = static_cast<int>(std::floor((z + 0.5) * rz));
        if (zi < 0) zi = 0; if (zi >= sz) zi = sz - 1;
        for (int y = 0; y < dy; ++y) {
            int yi = static_cast<int>(std::floor((y + 0.5) * ry));
            if (yi < 0) yi = 0; if (yi >= sy) yi = sy - 1;
            const float* srow = src + (static_cast<int64_t>(zi) * sy + yi) * sx;
            float* row = dst + (static_cast<int64_t>(z) * dy + y) * dx;
            for (int x = 0; x < dx; ++x) {
                int xi = static_cast<int>(std::floor((x + 0.5) * rx));
                if (xi < 0) xi = 0; if (xi >= sx) xi = sx - 1;
                row[x] = srow[xi];
            }
        }
    }
}

// 3-D bilateral filter (sitk.Bilateral capability, lib/transforms.py:308-320):
// gaussian spatial window (domain_sigma, voxel units; radius 2.5 sigma) x
// gaussian range weight on intensity difference (range_sigma), the range
// gaussian evaluated through a sampled lookup table like ITK's
// numberOfRangeGaussianSamples.
void da_bilateral(const float* src, float* dst, int32_t sx, int32_t sy,
                  int32_t sz, float domain_sigma, float range_sigma,
                  int32_t n_range_samples) {
    int r = static_cast<int>(std::ceil(2.5 * domain_sigma));
    if (r < 1) r = 1;
    const int w = 2 * r + 1;
    std::vector<float> spatial(static_cast<size_t>(w) * w * w);
    const double inv_d = 1.0 / (2.0 * domain_sigma * domain_sigma);
    for (int dz = -r; dz <= r; ++dz)
        for (int dy = -r; dy <= r; ++dy)
            for (int dx = -r; dx <= r; ++dx)
                spatial[((dz + r) * w + (dy + r)) * w + (dx + r)] =
                    static_cast<float>(
                        std::exp(-(dz * dz + dy * dy + dx * dx) * inv_d));
    // range LUT over [0, 4 sigma]
    int ns = n_range_samples > 4 ? n_range_samples : 50;
    std::vector<float> lut(static_cast<size_t>(ns) + 1);
    const double max_diff = 4.0 * range_sigma;
    const double inv_r = 1.0 / (2.0 * range_sigma * range_sigma);
    for (int i = 0; i <= ns; ++i) {
        double d = max_diff * i / ns;
        lut[static_cast<size_t>(i)] =
            static_cast<float>(std::exp(-d * d * inv_r));
    }
    const double lut_scale = ns / max_diff;
    for (int z = 0; z < sz; ++z) {
        for (int y = 0; y < sy; ++y) {
            for (int x = 0; x < sx; ++x) {
                const float c =
                    src[(static_cast<int64_t>(z) * sy + y) * sx + x];
                double num = 0.0, den = 0.0;
                for (int dz = -r; dz <= r; ++dz) {
                    int zz = z + dz;
                    if (zz < 0 || zz >= sz) continue;
                    for (int dy = -r; dy <= r; ++dy) {
                        int yy = y + dy;
                        if (yy < 0 || yy >= sy) continue;
                        const float* srow =
                            src + (static_cast<int64_t>(zz) * sy + yy) * sx;
                        const float* sw =
                            &spatial[((dz + r) * w + (dy + r)) * w];
                        for (int dx = -r; dx <= r; ++dx) {
                            int xx = x + dx;
                            if (xx < 0 || xx >= sx) continue;
                            float v = srow[xx];
                            double diff = std::fabs(
                                static_cast<double>(v) - c);
                            int li = diff >= max_diff
                                ? ns
                                : static_cast<int>(diff * lut_scale);
                            double wgt = static_cast<double>(sw[dx + r]) *
                                lut[static_cast<size_t>(li)];
                            num += wgt * v;
                            den += wgt;
                        }
                    }
                }
                dst[(static_cast<int64_t>(z) * sy + y) * sx + x] =
                    den > 0 ? static_cast<float>(num / den) : c;
            }
        }
    }
}

}  // extern "C"
