// Native frame loader: background prefetch of KITTI velodyne .bin scans.
//
// TPU-native equivalent of the host-side IO the reference delegates to ROS
// (rosbag playback via the external kitti_tool + pcl::fromROSMsg
// deserialization at every node edge, ref: src/odomEstimationNode.cpp:115-118,
// launch/pfilter_kitti.launch:74-76).  The device consumes ~1 GB/s of scans
// at 10 Hz x several sequences; Python file IO stalls the feed, so reads run
// on a C++ thread pool ahead of the consumer, directly into reusable
// buffers handed back through a bounded ring.
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   fl_open(paths, n_paths, max_floats, n_threads, depth) -> handle
//   fl_next(handle, out, max_floats) -> number of floats copied (0 = end,
//                                       -1 = error)
//   fl_close(handle)
//
// Build: make -C runtime/io   (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<float> data;
  int64_t n_floats = 0;
  int64_t seq = 0;
  bool error = false;
};

struct Loader {
  std::vector<std::string> paths;
  int64_t max_floats = 0;
  size_t depth = 4;

  std::mutex mu;
  std::condition_variable cv_produce;  // workers wait: room in window
  std::condition_variable cv_consume;  // consumer waits: next frame ready
  std::deque<Frame> ready;             // ordered window of loaded frames
  std::atomic<int64_t> next_to_load{0};
  int64_t next_to_emit = 0;
  bool closing = false;

  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      int64_t idx = next_to_load.fetch_add(1);
      if (idx >= static_cast<int64_t>(paths.size())) return;

      Frame f;
      f.seq = idx;
      f.data.resize(max_floats);
      FILE* fp = std::fopen(paths[idx].c_str(), "rb");
      if (fp == nullptr) {
        f.error = true;
      } else {
        f.n_floats = static_cast<int64_t>(
            std::fread(f.data.data(), sizeof(float), max_floats, fp));
        std::fclose(fp);
      }

      std::unique_lock<std::mutex> lk(mu);
      // Keep the reorder window bounded: a worker that ran far ahead waits
      // until its frame is within `depth` of the next frame to emit.
      cv_produce.wait(lk, [&] { return closing || idx < next_to_emit + static_cast<int64_t>(depth); });
      if (closing) return;
      ready.push_back(std::move(f));
      cv_consume.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* fl_open(const char** paths, int64_t n_paths, int64_t max_floats,
              int32_t n_threads, int32_t depth) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n_paths);
  l->max_floats = max_floats;
  l->depth = depth > 0 ? static_cast<size_t>(depth) : 4;
  int32_t nt = n_threads > 0 ? n_threads : 2;
  for (int32_t i = 0; i < nt; ++i) {
    l->workers.emplace_back([l] { l->worker(); });
  }
  return l;
}

int64_t fl_next(void* handle, float* out, int64_t max_floats) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  if (l->next_to_emit >= static_cast<int64_t>(l->paths.size())) return 0;
  for (;;) {
    for (auto it = l->ready.begin(); it != l->ready.end(); ++it) {
      if (it->seq == l->next_to_emit) {
        if (it->error) {
          l->ready.erase(it);
          ++l->next_to_emit;
          l->cv_produce.notify_all();
          return -1;
        }
        int64_t n = it->n_floats < max_floats ? it->n_floats : max_floats;
        std::memcpy(out, it->data.data(), static_cast<size_t>(n) * sizeof(float));
        l->ready.erase(it);
        ++l->next_to_emit;
        l->cv_produce.notify_all();
        return n;
      }
    }
    l->cv_consume.wait(lk);
  }
}

void fl_close(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->closing = true;
  }
  l->cv_produce.notify_all();
  l->cv_consume.notify_all();
  // Drain remaining work indices so joining is fast.
  l->next_to_load.store(static_cast<int64_t>(l->paths.size()));
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
