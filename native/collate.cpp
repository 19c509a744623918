// Native data-pipeline stage: fused uint8 -> float32 per-channel
// scale+shift normalization over image batches, multithreaded.
//
// The reference's data path leans on native code via cv2/torch tensor ops
// (reference: data/dataset.py:40-124 normalizes every image per load); this
// is our owned equivalent for the host side of the pipeline: one pass over
// the bytes, dst[i] = src[i] * scale[c] + shift[c], where
//   plain [0,1]:    scale = 1/255,        shift = 0
//   ImageNet norm:  scale = 1/(255*std),  shift = -mean/std
// Exposed via ctypes (adam_dehaze_tpu/data/native_collate.py) with a numpy
// fallback.

#include <cstdint>
#include <cstddef>
#include <thread>
#include <vector>

extern "C" {

// src: n_images * h * w * c uint8, interleaved channels.
// dst: same element count, float32.
// scale/shift: per-channel (c entries).
void normalize_u8_batch(const uint8_t* src, float* dst,
                        int64_t n_images, int64_t pixels_per_image,
                        int32_t channels, const float* scale,
                        const float* shift, int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  const int64_t per_image = pixels_per_image * channels;

  auto worker = [&](int64_t img_begin, int64_t img_end) {
    // Per-channel LUT: 256 * channels table beats recomputing the FMA and
    // keeps the inner loop load->store.
    std::vector<float> lut(static_cast<size_t>(256) * channels);
    for (int32_t ch = 0; ch < channels; ++ch)
      for (int v = 0; v < 256; ++v)
        lut[static_cast<size_t>(ch) * 256 + v] = v * scale[ch] + shift[ch];
    for (int64_t i = img_begin; i < img_end; ++i) {
      const uint8_t* s = src + i * per_image;
      float* d = dst + i * per_image;
      for (int64_t p = 0; p < per_image; p += channels)
        for (int32_t ch = 0; ch < channels; ++ch)
          d[p + ch] = lut[static_cast<size_t>(ch) * 256 + s[p + ch]];
    }
  };

  if (n_threads == 1 || n_images == 1) {
    worker(0, n_images);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t step = (n_images + n_threads - 1) / n_threads;
  for (int64_t b = 0; b < n_images; b += step)
    threads.emplace_back(worker, b, std::min(b + step, n_images));
  for (auto& t : threads) t.join();
}

}  // extern "C"
