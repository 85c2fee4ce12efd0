// Threaded multi-camera frame loader.
//
// TPU-native equivalent of the reference's per-frame decode stage
// (CoSLAM::grabReadFrame, SL_CoSLAM.cpp:114-133: one pthread per camera
// decoding + resizing while the pipeline runs). Here: one worker thread
// per camera prefetches frames into a ring buffer ahead of the SLAM loop,
// so host decode overlaps device compute. Exposed to Python via ctypes
// (no pybind11 in the image).
//
// Sources per camera:
//   mode 0 ("raw"):  a single file  [magic 'CSRW'][u32 w][u32 h][u32 n]
//                    followed by n frames of w*h bytes (grayscale u8).
//   mode 1 ("pgm"):  a printf pattern ("dir/cam0_%06d.pgm") of binary
//                    P5 images, frame index starting at 0.
//
// Frames are optionally box-resized to the requested output size (the
// reference resizes with cv::resize on load).
//
// Build: g++ -O3 -shared -fPIC -pthread frameloader.cpp -o libframeloader.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<uint8_t> data;
  long index = -1;
  bool eof = false;
};

struct CamReader {
  int mode = 0;
  std::string path;
  int src_w = 0, src_h = 0;
  long n_frames = -1;   // -1 = unknown (pgm mode: until open fails)
  FILE* raw = nullptr;
  long raw_data_off = 0;

  bool open() {
    if (mode == 0) {
      raw = std::fopen(path.c_str(), "rb");
      if (!raw) return false;
      char magic[4];
      uint32_t w, h, n;
      if (std::fread(magic, 1, 4, raw) != 4 ||
          std::memcmp(magic, "CSRW", 4) != 0 ||
          std::fread(&w, 4, 1, raw) != 1 || std::fread(&h, 4, 1, raw) != 1 ||
          std::fread(&n, 4, 1, raw) != 1)
        return false;
      src_w = (int)w;
      src_h = (int)h;
      n_frames = (long)n;
      raw_data_off = std::ftell(raw);
      return true;
    }
    return probe_pgm(0);
  }

  bool probe_pgm(long idx) {
    char buf[4096];
    std::snprintf(buf, sizeof(buf), path.c_str(), idx);
    FILE* f = std::fopen(buf, "rb");
    if (!f) return false;
    int w, h, maxv;
    bool ok = read_pgm_header(f, &w, &h, &maxv);
    if (ok) {
      src_w = w;
      src_h = h;
    }
    std::fclose(f);
    return ok;
  }

  static bool read_pgm_header(FILE* f, int* w, int* h, int* maxv) {
    char m0 = std::fgetc(f), m1 = std::fgetc(f);
    if (m0 != 'P' || m1 != '5') return false;
    int vals[3], got = 0;
    while (got < 3) {
      int c = std::fgetc(f);
      if (c == EOF) return false;
      if (c == '#') {  // comment line
        while (c != '\n' && c != EOF) c = std::fgetc(f);
        continue;
      }
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') continue;
      int v = 0;
      while (c >= '0' && c <= '9') {
        v = v * 10 + (c - '0');
        c = std::fgetc(f);
      }
      vals[got++] = v;
    }
    *w = vals[0];
    *h = vals[1];
    *maxv = vals[2];
    return true;
  }

  // read frame `idx` into buf (src_w*src_h u8). Returns false at EOF.
  bool read(long idx, uint8_t* buf) {
    if (mode == 0) {
      if (n_frames >= 0 && idx >= n_frames) return false;
      long off = raw_data_off + (long)idx * src_w * src_h;
      if (std::fseek(raw, off, SEEK_SET) != 0) return false;
      return std::fread(buf, 1, (size_t)src_w * src_h, raw) ==
             (size_t)src_w * src_h;
    }
    char name[4096];
    std::snprintf(name, sizeof(name), path.c_str(), idx);
    FILE* f = std::fopen(name, "rb");
    if (!f) return false;
    int w, h, maxv;
    if (!read_pgm_header(f, &w, &h, &maxv) || w != src_w || h != src_h) {
      std::fclose(f);
      return false;
    }
    bool ok = std::fread(buf, 1, (size_t)w * h, f) == (size_t)w * h;
    std::fclose(f);
    return ok;
  }

  ~CamReader() {
    if (raw) std::fclose(raw);
  }
};

// nearest/box resize u8 grayscale
void resize_u8(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
               int dh) {
  if (sw == dw && sh == dh) {
    std::memcpy(dst, src, (size_t)sw * sh);
    return;
  }
  for (int y = 0; y < dh; ++y) {
    int sy0 = (int)((long)y * sh / dh);
    int sy1 = (int)((long)(y + 1) * sh / dh);
    if (sy1 <= sy0) sy1 = sy0 + 1;
    for (int x = 0; x < dw; ++x) {
      int sx0 = (int)((long)x * sw / dw);
      int sx1 = (int)((long)(x + 1) * sw / dw);
      if (sx1 <= sx0) sx1 = sx0 + 1;
      int acc = 0, cnt = 0;
      for (int yy = sy0; yy < sy1; ++yy)
        for (int xx = sx0; xx < sx1; ++xx) {
          acc += src[(size_t)yy * sw + xx];
          ++cnt;
        }
      dst[(size_t)y * dw + x] = (uint8_t)(acc / cnt);
    }
  }
}

struct Loader {
  int n_cams, out_w, out_h, ring_size;
  std::vector<long> start;   // per-camera first source frame (skip offsets)
  std::vector<CamReader> readers;
  std::vector<std::thread> workers;
  // ring[cam][slot]
  std::vector<std::vector<Frame>> ring;
  std::vector<long> head;  // next frame index each camera will produce
  long consumed = 0;       // frames handed to the consumer
  std::mutex mu;
  std::condition_variable cv_prod, cv_cons;
  std::atomic<bool> stop{false};

  void worker(int c) {
    std::vector<uint8_t> tmp((size_t)readers[c].src_w * readers[c].src_h);
    long idx = 0;  // output index; source frame = start[c] + idx
    while (!stop.load()) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_prod.wait(lk, [&] {
          return stop.load() || idx - consumed < ring_size;
        });
        if (stop.load()) return;
      }
      Frame fr;
      fr.index = idx;
      fr.data.resize((size_t)out_w * out_h);
      bool ok = readers[c].read(start[c] + idx, tmp.data());
      if (ok) {
        resize_u8(tmp.data(), readers[c].src_w, readers[c].src_h,
                  fr.data.data(), out_w, out_h);
      } else {
        fr.eof = true;
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        ring[c][idx % ring_size] = std::move(fr);
        head[c] = idx + 1;
      }
      cv_cons.notify_all();
      if (!ok) return;  // EOF: stop producing for this camera
      ++idx;
    }
  }

  // Blocks until frame `consumed` is ready for all cameras; copies
  // [n_cams, out_h, out_w] u8 into out. Returns 1 ok, 0 EOF.
  int next(uint8_t* out) {
    long want = consumed;
    std::unique_lock<std::mutex> lk(mu);
    cv_cons.wait(lk, [&] {
      for (int c = 0; c < n_cams; ++c)
        if (head[c] <= want) return false;
      return true;
    });
    for (int c = 0; c < n_cams; ++c) {
      Frame& fr = ring[c][want % ring_size];
      if (fr.eof || fr.index != want) return 0;
      std::memcpy(out + (size_t)c * out_w * out_h, fr.data.data(),
                  (size_t)out_w * out_h);
    }
    consumed = want + 1;
    lk.unlock();
    cv_prod.notify_all();
    return 1;
  }
};

}  // namespace

extern "C" {

void* fl_open_at(const char** paths, const long* start, int n_cams,
                 int mode, int out_w, int out_h, int ring_size);

void* fl_open(const char** paths, int n_cams, int mode, int out_w, int out_h,
              int ring_size) {
  return fl_open_at(paths, nullptr, n_cams, mode, out_w, out_h, ring_size);
}

void* fl_open_at(const char** paths, const long* start, int n_cams, int mode,
                 int out_w, int out_h, int ring_size) {
  auto* L = new Loader();
  L->n_cams = n_cams;
  L->out_w = out_w;
  L->out_h = out_h;
  L->ring_size = ring_size < 2 ? 2 : ring_size;
  L->readers.resize(n_cams);
  for (int c = 0; c < n_cams; ++c) {
    L->readers[c].mode = mode;
    L->readers[c].path = paths[c];
    if (!L->readers[c].open()) {
      delete L;
      return nullptr;
    }
    if (out_w <= 0) {
      L->out_w = L->readers[c].src_w;
      L->out_h = L->readers[c].src_h;
    }
  }
  L->ring.assign(n_cams, std::vector<Frame>(L->ring_size));
  L->head.assign(n_cams, 0);
  L->start.assign(n_cams, 0);
  if (start)
    for (int c = 0; c < n_cams; ++c) L->start[c] = start[c];
  for (int c = 0; c < n_cams; ++c)
    L->workers.emplace_back(&Loader::worker, L, c);
  return L;
}

int fl_next(void* h, uint8_t* out) {
  return static_cast<Loader*>(h)->next(out);
}

int fl_src_size(void* h, int cam, int* w, int* hh) {
  auto* L = static_cast<Loader*>(h);
  if (cam < 0 || cam >= L->n_cams) return 0;
  *w = L->readers[cam].src_w;
  *hh = L->readers[cam].src_h;
  return 1;
}

long fl_frame_count(void* h, int cam) {
  auto* L = static_cast<Loader*>(h);
  return L->readers[cam].n_frames;
}

void fl_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  L->stop.store(true);
  L->cv_prod.notify_all();
  L->cv_cons.notify_all();
  for (auto& t : L->workers)
    if (t.joinable()) t.join();
  delete L;
}

}  // extern "C"
