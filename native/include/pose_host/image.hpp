// Decoded image + preprocessing declarations (see src/image.cpp).
#pragma once

#include <cstdint>
#include <vector>

namespace pose_host {

struct Image {
  int w = 0, h = 0;               // dims of the DECODED pixel plane
  // Dims of the ORIGINAL image (0 = same as w/h). DCT-scaled JPEG decode
  // sets these larger than w/h; letterbox_resize computes its scale/pad
  // contract against the ORIGINAL dims so detections always map back to
  // source pixels, whatever scale the decoder chose.
  int full_w = 0, full_h = 0;
  std::vector<std::uint8_t> rgb;  // HWC, RGB
};

// target_h/target_w (optional): the letterbox geometry the caller will
// resize into; JPEGs then use libjpeg DCT scaling (scale_num/denom) to
// decode at the coarsest M/8 scale that keeps the decoded image no
// smaller than the letterboxed content — large photos decode ~4-8x
// faster with no resolution loss at the network input.
bool decode_image(const char* path, Image* out, int target_h = 0,
                  int target_w = 0);
void letterbox_resize(const Image& src, int hin, int win, std::uint8_t* dst,
                      float* scale_out, float* pad_out);
void space_to_depth_u8(const std::uint8_t* src, int h, int w,
                       std::uint8_t* dst);
void space_to_depth2_u8(const std::uint8_t* src, int h, int w,
                        std::uint8_t* dst);

}  // namespace pose_host
