// fastloader: threaded JPEG/PNG decode + normalize pipeline for DAVIS-2016.
//
// Native rebuild of the data path the reference delegates to torch
// DataLoader worker processes (src/util/io_helper.py:62-77): worker threads
// read+decode the JPEG frame and the PNG annotation, convert to float32,
// subtract the dataset channel mean (BGR order to match cv2 semantics,
// src/dataloaders/davis_2016.py:28,127-128) and normalize the mask to [0,1]
// by its max (davis_2016.py:131-132). Decoded samples land in a bounded ring
// consumed from Python via ctypes (fosvos_tpu/data/loader.py).
//
// Build: g++ -O2 -shared -fPIC fastloader.cpp -o libfastloader.so -ljpeg -lpng -lpthread
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to BGR uint8 (cv2.imread channel order). Returns true
// on success; out is resized to h*w*3 and (h, w) are set.
bool decode_jpeg_bgr(const char* path, std::vector<uint8_t>& out, int& h,
                     int& w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  const int stride = w * 3;
  out.resize(static_cast<size_t>(h) * stride);
  std::vector<uint8_t> row(stride);
  uint8_t* rowp = row.data();
  for (int y = 0; y < h; ++y) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    uint8_t* dst = out.data() + static_cast<size_t>(y) * stride;
    for (int x = 0; x < w; ++x) {  // RGB -> BGR
      dst[x * 3 + 0] = row[x * 3 + 2];
      dst[x * 3 + 1] = row[x * 3 + 1];
      dst[x * 3 + 2] = row[x * 3 + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Decode a PNG file to grayscale uint8 (cv2.imread(path, 0) semantics for
// paletted/gray DAVIS annotations).
bool decode_png_gray(const char* path, std::vector<uint8_t>& out, int& h,
                     int& w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(f);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  const int channels = png_get_channels(png, info);
  std::vector<uint8_t> row(static_cast<size_t>(w) * channels);
  out.resize(static_cast<size_t>(h) * w);
  for (int y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    uint8_t* dst = out.data() + static_cast<size_t>(y) * w;
    if (channels == 1) {
      memcpy(dst, row.data(), w);
    } else {
      // BT.601 luma, same rounding as cv2 BGR2GRAY
      for (int x = 0; x < w; ++x) {
        const uint8_t r = row[x * channels + 0];
        const uint8_t g = row[x * channels + 1];
        const uint8_t b = row[x * channels + 2];
        dst[x] = static_cast<uint8_t>((299 * r + 587 * g + 114 * b + 500) / 1000);
      }
    }
  }
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

struct Sample {
  int index = -1;            // position in the requested order
  bool ok = false;
  std::vector<float> img;    // H*W*3, mean-subtracted (normalized mode)
  std::vector<float> gt;     // H*W, [0,1] (normalized mode)
  std::vector<uint8_t> img_u8;  // raw mode: H*W*3 BGR
  std::vector<uint8_t> gt_u8;   // raw mode: H*W mask
  int h = 0, w = 0;
};

struct Loader {
  std::vector<std::string> img_paths;
  std::vector<std::string> lab_paths;  // empty string => no annotation
  float mean[3];
  bool raw = false;  // emit uint8 (device-side normalization) vs float32
  int n_threads;
  size_t capacity;

  std::atomic<int> next_index{0};
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::queue<Sample> ready;
  std::vector<std::thread> workers;
  std::atomic<int> n_done{0};
  bool stopped = false;

  void worker() {
    std::vector<uint8_t> img_u8, lab_u8;
    for (;;) {
      const int i = next_index.fetch_add(1);
      if (stopped || i >= static_cast<int>(img_paths.size())) break;
      Sample s;
      s.index = i;
      int h = 0, w = 0;
      if (decode_jpeg_bgr(img_paths[i].c_str(), img_u8, h, w)) {
        s.h = h;
        s.w = w;
        s.ok = true;
        if (raw) {
          s.img_u8 = img_u8;
          s.gt_u8.assign(static_cast<size_t>(h) * w, 0);
        } else {
          s.img.resize(static_cast<size_t>(h) * w * 3);
          for (size_t p = 0; p < s.img.size(); p += 3) {
            s.img[p + 0] = static_cast<float>(img_u8[p + 0]) - mean[0];
            s.img[p + 1] = static_cast<float>(img_u8[p + 1]) - mean[1];
            s.img[p + 2] = static_cast<float>(img_u8[p + 2]) - mean[2];
          }
          s.gt.assign(static_cast<size_t>(h) * w, 0.0f);
        }
        if (!lab_paths[i].empty()) {
          int lh = 0, lw = 0;
          if (decode_png_gray(lab_paths[i].c_str(), lab_u8, lh, lw) &&
              lh == h && lw == w) {
            if (raw) {
              s.gt_u8 = lab_u8;
            } else {
              uint8_t mx = 0;
              for (size_t p = 0; p < lab_u8.size(); ++p)
                if (lab_u8[p] > mx) mx = lab_u8[p];
              const float div = mx > 0 ? static_cast<float>(mx) : 1e-8f;
              for (size_t p = 0; p < lab_u8.size(); ++p)
                s.gt[p] = static_cast<float>(lab_u8[p]) / div;
            }
          } else {
            s.ok = false;
          }
        }
      }
      {
        std::unique_lock<std::mutex> lock(mu);
        cv_push.wait(lock,
                     [&] { return ready.size() < capacity || stopped; });
        if (stopped) break;
        ready.push(std::move(s));
      }
      cv_pop.notify_one();
    }
    n_done.fetch_add(1);
    cv_pop.notify_all();
  }
};

}  // namespace

extern "C" {

void* fl_create_mode(const char** img_paths, const char** lab_paths, int n,
                     int n_threads, int capacity, float m0, float m1,
                     float m2, int raw) {
  Loader* L = new Loader();
  L->raw = raw != 0;
  L->img_paths.reserve(n);
  L->lab_paths.reserve(n);
  for (int i = 0; i < n; ++i) {
    L->img_paths.emplace_back(img_paths[i]);
    L->lab_paths.emplace_back(lab_paths[i] ? lab_paths[i] : "");
  }
  L->mean[0] = m0;
  L->mean[1] = m1;
  L->mean[2] = m2;
  L->n_threads = n_threads > 0 ? n_threads : 4;
  L->capacity = capacity > 0 ? capacity : 8;
  for (int t = 0; t < L->n_threads; ++t)
    L->workers.emplace_back(&Loader::worker, L);
  return L;
}

void* fl_create(const char** img_paths, const char** lab_paths, int n,
                int n_threads, int capacity, float m0, float m1, float m2) {
  return fl_create_mode(img_paths, lab_paths, n, n_threads, capacity, m0, m1,
                        m2, /*raw=*/0);
}

// Raw-mode pop: uint8 BGR frame + uint8 mask (device-side normalization).
int fl_next_raw(void* handle, uint8_t* img_out, uint8_t* gt_out,
                int expected_h, int expected_w) {
  Loader* L = static_cast<Loader*>(handle);
  Sample s;
  {
    std::unique_lock<std::mutex> lock(L->mu);
    L->cv_pop.wait(lock, [&] {
      return !L->ready.empty() || L->n_done.load() == L->n_threads;
    });
    if (L->ready.empty()) return -1;
    s = std::move(L->ready.front());
    L->ready.pop();
  }
  L->cv_push.notify_one();
  if (!s.ok || s.h != expected_h || s.w != expected_w) return -2;
  memcpy(img_out, s.img_u8.data(), s.img_u8.size());
  memcpy(gt_out, s.gt_u8.data(), s.gt_u8.size());
  return s.index;
}

// Pop one decoded sample (any order). Returns the sample's index, or -1 when
// the stream is exhausted, or -2 on decode failure of that sample.
// img_out must hold h*w*3 floats, gt_out h*w floats (caller knows H, W).
int fl_next(void* handle, float* img_out, float* gt_out, int expected_h,
            int expected_w) {
  Loader* L = static_cast<Loader*>(handle);
  Sample s;
  {
    std::unique_lock<std::mutex> lock(L->mu);
    L->cv_pop.wait(lock, [&] {
      return !L->ready.empty() || L->n_done.load() == L->n_threads;
    });
    if (L->ready.empty()) return -1;
    s = std::move(L->ready.front());
    L->ready.pop();
  }
  L->cv_push.notify_one();
  if (!s.ok || s.h != expected_h || s.w != expected_w) return -2;
  memcpy(img_out, s.img.data(), s.img.size() * sizeof(float));
  memcpy(gt_out, s.gt.data(), s.gt.size() * sizeof(float));
  return s.index;
}

void fl_destroy(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lock(L->mu);
    L->stopped = true;
  }
  L->cv_push.notify_all();
  L->cv_pop.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

// One-shot synchronous decode helpers (used for image probing + tests).
int fl_probe_size(const char* img_path, int* h, int* w) {
  std::vector<uint8_t> buf;
  return decode_jpeg_bgr(img_path, buf, *h, *w) ? 0 : -1;
}

}  // extern "C"

namespace {

// Encode one grayscale 8-bit PNG (the mask format the reference writes,
// experiment_helper.py:63-64). Compression level 1 matches cv2.imwrite's
// default IMWRITE_PNG_COMPRESSION=1 — masks are large flat regions, so
// fast filtering wins over ratio.
bool encode_png_gray(const char* path, const uint8_t* data, int h, int w) {
  FILE* f = fopen(path, "wb");
  if (!f) return false;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                              nullptr);
  if (!png) {
    fclose(f);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    fclose(f);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_GRAY, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_set_compression_level(png, 1);
  png_write_info(png, info);
  for (int y = 0; y < h; ++y)
    png_write_row(png, const_cast<png_bytep>(
        static_cast<png_const_bytep>(data + static_cast<size_t>(y) * w)));
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(f);
  return true;
}

}  // namespace

extern "C" {

// Threaded mask writer: encode+write n grayscale PNGs ((n,h,w) uint8,
// contiguous) in parallel. Returns the number written successfully.
int fl_write_masks(const char** paths, const uint8_t* masks, int n, int h,
                   int w, int n_threads) {
  if (n <= 0) return 0;
  std::atomic<int> next{0};
  std::atomic<int> ok{0};
  auto work = [&] {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      if (encode_png_gray(paths[i],
                          masks + static_cast<size_t>(i) * h * w, h, w))
        ok.fetch_add(1);
    }
  };
  int nt = n_threads > 0 ? n_threads : 4;
  if (nt > n) nt = n;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"
