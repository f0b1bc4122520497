// Native frame loader: threaded decode + prefetch ring.
//
// The reference's frame supply is synchronous cv2.VideoCapture reads in the
// UI loop; at TPU throughputs (tens of fps of 720p pairs) Python-side decode
// becomes the bottleneck. This loader decodes JPEG (libjpeg), PNG (libpng
// simplified API) and PGM/PPM on a worker pool, keeping a bounded window of
// frames ahead of the consumer. Exposed through ctypes
// (stereovision_tpu/io/native_loader.py).
//
// Build: make -C native

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  std::vector<float> data;  // grayscale or interleaved RGB
  int w = 0, h = 0, ch = 0;
  bool ok = false;
};

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

Image decode_jpeg(const char* path, bool gray) {
  Image out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.w = cinfo.output_width;
  out.h = cinfo.output_height;
  out.ch = cinfo.output_components;
  out.data.resize(static_cast<size_t>(out.w) * out.h * out.ch);
  std::vector<unsigned char> row(static_cast<size_t>(out.w) * out.ch);
  unsigned char* rp = row.data();
  for (int y = 0; y < out.h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = out.data.data() + static_cast<size_t>(y) * out.w * out.ch;
    for (size_t i = 0; i < row.size(); ++i) dst[i] = static_cast<float>(row[i]);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  out.ok = true;
  return out;
}

Image decode_png(const char* path, bool gray) {
  Image out;
  png_image img;
  memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&img, path)) return out;
  img.format = gray ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
  std::vector<unsigned char> buf(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, buf.data(), 0, nullptr)) {
    png_image_free(&img);
    return out;
  }
  out.w = img.width;
  out.h = img.height;
  out.ch = gray ? 1 : 3;
  out.data.resize(buf.size());
  for (size_t i = 0; i < buf.size(); ++i) out.data[i] = static_cast<float>(buf[i]);
  out.ok = true;
  return out;
}

Image decode_pnm(const char* path, bool gray) {
  Image out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;
  char magic[3] = {0};
  int w, h, maxv;
  if (fscanf(f, "%2s %d %d %d", magic, &w, &h, &maxv) != 4 || maxv > 255) {
    fclose(f);
    return out;
  }
  fgetc(f);  // single whitespace
  int ch = (strcmp(magic, "P6") == 0) ? 3 : 1;
  std::vector<unsigned char> buf(static_cast<size_t>(w) * h * ch);
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    fclose(f);
    return out;
  }
  fclose(f);
  out.w = w;
  out.h = h;
  if (gray && ch == 3) {
    out.ch = 1;
    out.data.resize(static_cast<size_t>(w) * h);
    for (size_t i = 0; i < out.data.size(); ++i) {
      const unsigned char* p = &buf[i * 3];
      out.data[i] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
    }
  } else {
    out.ch = ch;
    out.data.resize(buf.size());
    for (size_t i = 0; i < buf.size(); ++i) out.data[i] = buf[i];
  }
  out.ok = true;
  return out;
}

Image decode_any(const std::string& path, bool gray) {
  auto dot = path.rfind('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot + 1);
  for (auto& c : ext) c = tolower(c);
  Image img;
  if (ext == "jpg" || ext == "jpeg") img = decode_jpeg(path.c_str(), gray);
  else if (ext == "png") img = decode_png(path.c_str(), gray);
  else if (ext == "pgm" || ext == "ppm" || ext == "pnm") img = decode_pnm(path.c_str(), gray);
  if (img.ok && !gray && img.ch == 1) {
    // promote gray source to 3 channels for a uniform contract
    Image rgb;
    rgb.w = img.w; rgb.h = img.h; rgb.ch = 3; rgb.ok = true;
    rgb.data.resize(img.data.size() * 3);
    for (size_t i = 0; i < img.data.size(); ++i)
      rgb.data[i * 3] = rgb.data[i * 3 + 1] = rgb.data[i * 3 + 2] = img.data[i];
    return rgb;
  }
  if (img.ok && gray && img.ch == 3) {
    Image g;
    g.w = img.w; g.h = img.h; g.ch = 1; g.ok = true;
    g.data.resize(static_cast<size_t>(img.w) * img.h);
    for (size_t i = 0; i < g.data.size(); ++i) {
      const float* p = &img.data[i * 3];
      g.data[i] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
    }
    return g;
  }
  return img;
}

struct Prefetcher {
  std::vector<std::string> paths;
  bool gray;
  int window;
  std::map<int, Image> ready;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int> next_to_decode{0};
  std::atomic<int> consumer_pos{0};
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  Prefetcher(std::vector<std::string> p, bool g, int win, int n_threads)
      : paths(std::move(p)), gray(g), window(win) {
    for (int t = 0; t < n_threads; ++t)
      workers.emplace_back([this] { run(); });
  }

  void run() {
    while (!stop.load()) {
      int idx = next_to_decode.fetch_add(1);
      if (idx >= static_cast<int>(paths.size())) break;
      // bound the window: wait until the consumer catches up
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] {
          return stop.load() || idx < consumer_pos.load() + window;
        });
        if (stop.load()) break;
      }
      Image img = decode_any(paths[idx], gray);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace(idx, std::move(img));
      }
      cv.notify_all();
    }
  }

  bool fetch(int idx, float* out, int64_t cap, int* w, int* h, int* ch) {
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [&] { return ready.count(idx) > 0; });
    Image img = std::move(ready[idx]);
    ready.erase(idx);
    consumer_pos.store(idx + 1);
    cv.notify_all();
    lk.unlock();
    if (!img.ok || static_cast<int64_t>(img.data.size()) > cap) return false;
    memcpy(out, img.data.data(), img.data.size() * sizeof(float));
    *w = img.w;
    *h = img.h;
    *ch = img.ch;
    return true;
  }

  ~Prefetcher() {
    stop.store(true);
    cv.notify_all();
    for (auto& t : workers) t.join();
  }
};

}  // namespace

extern "C" {

int decode_image(const char* path, int gray, float* out, int64_t cap,
                 int* w, int* h, int* ch) {
  Image img = decode_any(path, gray != 0);
  if (!img.ok || static_cast<int64_t>(img.data.size()) > cap) return 0;
  memcpy(out, img.data.data(), img.data.size() * sizeof(float));
  *w = img.w;
  *h = img.h;
  *ch = img.ch;
  return 1;
}

void* loader_create(const char** paths, int n, int gray, int window, int n_threads) {
  std::vector<std::string> p(paths, paths + n);
  return new Prefetcher(std::move(p), gray != 0, window, n_threads);
}

int loader_fetch(void* handle, int idx, float* out, int64_t cap,
                 int* w, int* h, int* ch) {
  return static_cast<Prefetcher*>(handle)->fetch(idx, out, cap, w, h, ch) ? 1 : 0;
}

void loader_destroy(void* handle) { delete static_cast<Prefetcher*>(handle); }

}  // extern "C"
