// Native data-loader core: thread-pool JPEG/PNG decode + resize + BGR->RGB.
//
// The reference delegated image IO to cv2 Python bindings inside forked
// worker processes (/root/reference/tool/data_util.py:15-129). This C++
// core gives the rebuild a GIL-free ingest path: one call decodes and
// resizes a whole batch across a persistent thread pool, writing directly
// into a caller-owned uint8 tensor (zero Python-side copies). Exposed as a
// plain C API consumed via ctypes (tensorflow_ocr_tpu/data/native_loader.py).
//
// Build: native/build.sh (g++ + OpenCV C++ core/imgcodecs/imgproc).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

struct Loader {
  explicit Loader(int threads) : pool(threads) {}
  ThreadPool pool;
};

// Decode one file, resize to (out_w, out_h), write RGB uint8 rows.
// Returns 0 on success.
int DecodeOne(const char* path, int out_w, int out_h, uint8_t* out,
              int* src_h, int* src_w) {
  cv::Mat img = cv::imread(path, cv::IMREAD_COLOR);  // BGR
  if (img.empty()) return 1;
  if (src_h) *src_h = img.rows;
  if (src_w) *src_w = img.cols;
  cv::Mat resized;
  if (img.cols != out_w || img.rows != out_h) {
    cv::resize(img, resized, cv::Size(out_w, out_h), 0, 0, cv::INTER_LINEAR);
  } else {
    resized = img;
  }
  cv::Mat rgb(out_h, out_w, CV_8UC3, out);
  cv::cvtColor(resized, rgb, cv::COLOR_BGR2RGB);
  return 0;
}

}  // namespace

extern "C" {

void* ocr_loader_create(int threads) { return new Loader(threads); }

void ocr_loader_destroy(void* loader) { delete static_cast<Loader*>(loader); }

// Decode+resize a batch of n images into out (n, out_h, out_w, 3) uint8.
// paths: array of n C strings. status: per-image 0=ok. src_hw: optional
// (n, 2) int32 original sizes (pass nullptr to skip). Blocks until done.
void ocr_loader_load_batch(void* loader_ptr, const char** paths, int n,
                           int out_w, int out_h, uint8_t* out, int* status,
                           int* src_hw) {
  Loader* loader = static_cast<Loader*>(loader_ptr);
  std::atomic<int> remaining(n);
  std::mutex mu;
  std::condition_variable done;
  const size_t stride = static_cast<size_t>(out_w) * out_h * 3;
  for (int i = 0; i < n; ++i) {
    loader->pool.Submit([=, &remaining, &mu, &done] {
      int sh = 0, sw = 0;
      int rc = DecodeOne(paths[i], out_w, out_h, out + stride * i, &sh, &sw);
      if (status) status[i] = rc;
      if (src_hw) {
        src_hw[2 * i] = sh;
        src_hw[2 * i + 1] = sw;
      }
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        done.notify_all();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  done.wait(lk, [&] { return remaining.load() == 0; });
}

// One-shot convenience without a persistent pool.
int ocr_decode_resize(const char* path, int out_w, int out_h, uint8_t* out) {
  return DecodeOne(path, out_w, out_h, out, nullptr, nullptr);
}

}  // extern "C"
