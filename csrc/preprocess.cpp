// Native host-side preprocessing kernels for fastdepth_tpu.
//
// TPU-native replacement for the reference's per-item PIL/scipy transform
// chain (reference dataloaders/transforms.py; hot spot per SURVEY.md §3.2):
// the fused val-pipeline geometry is a (row, col) gather pair
// (fastdepth_tpu/data/pipeline.py), and these kernels execute that gather
// + dtype conversion at memcpy-like speed with no Python object overhead,
// releasing the GIL for the loader's thread pool.
//
// Build: make -C csrc   ->  libfdpreproc.so  (loaded via ctypes,
// fastdepth_tpu/data/native.py; numpy fallback when absent).

#include <cstdint>
#include <cstring>

namespace {

// u8 -> [0,1] f32 lookup table.  Function-local static of a class type:
// C++11 guarantees thread-safe one-time construction, so concurrent calls
// from the loader's thread pool are race-free (a hand-rolled bool flag
// would not be).
struct U8ToUnitF32 {
    float v[256];
    U8ToUnitF32() {
        for (int i = 0; i < 256; ++i) v[i] = static_cast<float>(i) / 255.0f;
    }
};

const float* unit_lut() {
    static const U8ToUnitF32 lut;
    return lut.v;
}

}  // namespace

extern "C" {

// ABI version handshake: the Python loader refuses a stale build whose
// version doesn't match (the .so is NOT version-controlled; it is built
// locally with `make -C csrc`).  Bump when any signature below changes.
int64_t fd_abi_version() { return 2; }

// rgb uint8 HWC -> gathered float32 HWC in [0, 1]
// dst[oh, ow, c] = src[rows[oh], cols[ow], c] / 255
void fd_gather_rgb_f32(const uint8_t* src, int64_t src_h, int64_t src_w,
                       const int64_t* rows, const int64_t* cols,
                       int64_t out_h, int64_t out_w, float* dst) {
    const float* lut = unit_lut();
    for (int64_t oh = 0; oh < out_h; ++oh) {
        const uint8_t* row = src + rows[oh] * src_w * 3;
        float* out = dst + oh * out_w * 3;
        for (int64_t ow = 0; ow < out_w; ++ow) {
            const uint8_t* px = row + cols[ow] * 3;
            out[ow * 3 + 0] = lut[px[0]];
            out[ow * 3 + 1] = lut[px[1]];
            out[ow * 3 + 2] = lut[px[2]];
        }
    }
}

// depth float32 HW -> gathered float32 HW
void fd_gather_depth_f32(const float* src, int64_t src_h, int64_t src_w,
                         const int64_t* rows, const int64_t* cols,
                         int64_t out_h, int64_t out_w, float* dst) {
    for (int64_t oh = 0; oh < out_h; ++oh) {
        const float* row = src + rows[oh] * src_w;
        float* out = dst + oh * out_w;
        for (int64_t ow = 0; ow < out_w; ++ow) {
            out[ow] = row[cols[ow]];
        }
    }
}

// CHW uint8 -> HWC uint8 (the h5 'rgb' key layout transpose,
// reference dataloaders/dataloader.py:8-13)
void fd_chw_to_hwc_u8(const uint8_t* src, int64_t h, int64_t w, uint8_t* dst) {
    const int64_t plane = h * w;
    for (int64_t y = 0; y < h; ++y) {
        for (int64_t x = 0; x < w; ++x) {
            const int64_t idx = y * w + x;
            uint8_t* out = dst + idx * 3;
            out[0] = src[idx];
            out[1] = src[plane + idx];
            out[2] = src[2 * plane + idx];
        }
    }
}

}  // extern "C"
