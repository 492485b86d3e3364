// Decoded image + preprocessing declarations (see src/image.cpp).
#pragma once

#include <cstdint>
#include <vector>

namespace pose_host {

struct Image {
  int w = 0, h = 0;
  std::vector<std::uint8_t> rgb;  // HWC, RGB
};

bool decode_image(const char* path, Image* out);
void letterbox_resize(const Image& src, int hin, int win, std::uint8_t* dst,
                      float* scale_out, float* pad_out);
void space_to_depth_u8(const std::uint8_t* src, int h, int w,
                       std::uint8_t* dst);
void space_to_depth2_u8(const std::uint8_t* src, int h, int w,
                        std::uint8_t* dst);

}  // namespace pose_host
