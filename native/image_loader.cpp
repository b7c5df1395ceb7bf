// cv_tpu native data loader.
//
// The reference framework's data loader is the Rust `image` crate invoked
// synchronously per frame (vslam-sandbox/src/main.rs:130-133,
// akaze/src/image.rs:45-109).  The TPU-native equivalent is this C++
// library: libpng decoding to 8-bit grayscale plus a thread-pool prefetcher
// so the host pipeline can overlap image IO/decode with device compute —
// feeding frames to the extractor faster than the TPU consumes them.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <png.h>

#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Decode one PNG file to 8-bit grayscale. Returns 0 on success. The caller
// owns *out and must release it with cvtpu_free.
int cvtpu_load_gray(const char* path, uint8_t** out, int* width, int* height) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) {
    return 1;
  }
  image.format = PNG_FORMAT_GRAY;  // libpng converts RGB via its luma
  const size_t stride = PNG_IMAGE_ROW_STRIDE(image);
  const size_t size = PNG_IMAGE_SIZE(image);
  uint8_t* buffer = static_cast<uint8_t*>(std::malloc(size));
  if (buffer == nullptr) {
    png_image_free(&image);
    return 2;
  }
  if (!png_image_finish_read(&image, nullptr, buffer, static_cast<png_int_32>(stride),
                             nullptr)) {
    std::free(buffer);
    return 3;
  }
  *out = buffer;
  *width = static_cast<int>(image.width);
  *height = static_cast<int>(image.height);
  return 0;
}

void cvtpu_free(uint8_t* buf) { std::free(buf); }

// ---------------------------------------------------------------------------
// Prefetching batch loader: decodes a list of paths on a worker pool;
// cvtpu_loader_get blocks only if the frame is not decoded yet.
// ---------------------------------------------------------------------------

struct Slot {
  uint8_t* data = nullptr;
  int width = 0;
  int height = 0;
  int status = -1;  // -1 pending, 0 ok, >0 error
};

struct Loader {
  std::vector<std::string> paths;
  std::vector<Slot> slots;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv;
  size_t next_job = 0;
  bool stop = false;
};

static void worker_loop(Loader* l) {
  for (;;) {
    size_t job;
    {
      std::unique_lock<std::mutex> lock(l->mu);
      if (l->stop || l->next_job >= l->paths.size()) return;
      job = l->next_job++;
    }
    Slot slot;
    slot.status =
        cvtpu_load_gray(l->paths[job].c_str(), &slot.data, &slot.width, &slot.height);
    {
      std::unique_lock<std::mutex> lock(l->mu);
      l->slots[job] = slot;
    }
    l->cv.notify_all();
  }
}

void* cvtpu_loader_create(const char** paths, int n, int threads) {
  Loader* l = new Loader();
  l->paths.reserve(n);
  for (int i = 0; i < n; ++i) l->paths.emplace_back(paths[i]);
  l->slots.resize(n);
  if (threads < 1) threads = 1;
  for (int i = 0; i < threads; ++i) l->workers.emplace_back(worker_loop, l);
  return l;
}

// Blocks until frame `index` is decoded. Returns its status (0 = ok).
// The returned buffer stays owned by the loader until destroy.
int cvtpu_loader_get(void* handle, int index, uint8_t** out, int* width,
                     int* height) {
  Loader* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lock(l->mu);
  l->cv.wait(lock, [&] { return l->slots[index].status != -1; });
  Slot& s = l->slots[index];
  *out = s.data;
  *width = s.width;
  *height = s.height;
  return s.status;
}

void cvtpu_loader_destroy(void* handle) {
  Loader* l = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lock(l->mu);
    l->stop = true;
    l->next_job = l->paths.size();
  }
  for (auto& t : l->workers) t.join();
  for (auto& s : l->slots) {
    if (s.data != nullptr) std::free(s.data);
  }
  delete l;
}

}  // extern "C"
