// Minimal google-benchmark stand-in, just enough surface to compile and run
// the REFERENCE's own bench harness (/root/reference/src/bench_cpu.cu)
// unmodified on this machine. Same role as tests/golden/shim: the scheme
// and benchmark logic above this header is the reference's own code; this
// file only supplies the timing scaffold (google-benchmark itself is not
// vendored in this environment).
//
// Surface used by bench_cpu.cu: benchmark::State (range-for protocol),
// state.iterations(), state.SetItemsProcessed(), benchmark::DoNotOptimize,
// BENCHMARK(fn)->Name("..."), and an implicit main from benchmark_main.
//
// Methodology mirrors google-benchmark's defaults: per-benchmark
// calibration to a minimum total runtime (0.5 s) with the timed region
// covering only the `for (auto _ : state)` loop (setup before the loop is
// excluded), reporting wall ns/iteration and items_per_second.
#pragma once

#include <chrono>
#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace benchmark {

template <class T>
inline void DoNotOptimize(T const &value) {
  asm volatile("" : : "r,m"(value) : "memory");
}

template <class T>
inline void DoNotOptimize(T &value) {
  asm volatile("" : "+r,m"(value) : : "memory");
}

class State {
 public:
  explicit State(int64_t iters) : iters_(iters), remaining_(iters) {}

  struct Sentinel {};

  struct Iterator {
    State *s;
    bool operator!=(Sentinel) {
      if (s->remaining_ > 0) return true;
      s->t1_ = std::chrono::steady_clock::now();
      return false;
    }
    void operator++() { --s->remaining_; }
    int operator*() const { return 0; }
  };

  Iterator begin() {
    remaining_ = iters_;
    t0_ = std::chrono::steady_clock::now();
    return Iterator{this};
  }
  Sentinel end() { return {}; }

  int64_t iterations() const { return iters_; }
  void SetItemsProcessed(int64_t n) { items_ = n; }

  double seconds() const {
    return std::chrono::duration<double>(t1_ - t0_).count();
  }
  int64_t items() const { return items_; }

 private:
  int64_t iters_;
  int64_t remaining_;
  int64_t items_ = 0;
  std::chrono::steady_clock::time_point t0_, t1_;
};

using Fn = void (*)(State &);

struct Bench {
  std::string name;
  Fn fn;
  Bench *Name(const char *n) {
    name = n;
    return this;
  }
};

inline std::vector<Bench *> &Registry() {
  static std::vector<Bench *> r;
  return r;
}

inline Bench *Register(const char *default_name, Fn fn) {
  auto *b = new Bench{default_name, fn};
  Registry().push_back(b);
  return b;
}

inline int RunAll(int argc, char **argv) {
  const char *filter = nullptr;
  double min_time = 0.5;
  for (int i = 1; i < argc; ++i) {
    if (!std::strncmp(argv[i], "--benchmark_filter=", 19)) {
      filter = argv[i] + 19;
    } else if (!std::strncmp(argv[i], "--min_time=", 11)) {
      min_time = std::atof(argv[i] + 11);
    }
  }
  for (Bench *b : Registry()) {
    if (filter && b->name.find(filter) == std::string::npos) continue;
    // Calibrate: grow the iteration count until the timed loop spans
    // >= min_time (google-benchmark's repetition strategy).
    int64_t iters = 1;
    double secs = 0.0;
    int64_t items = 0;
    for (int round = 0; round < 40; ++round) {
      State st(iters);
      b->fn(st);
      secs = st.seconds();
      items = st.items();
      if (secs >= min_time) break;
      double target = min_time * 1.4;
      int64_t next = secs > 1e-9
                         ? static_cast<int64_t>(iters * (target / secs))
                         : iters * 100;
      if (next <= iters) next = iters * 2;
      iters = next;
    }
    double ns = secs * 1e9 / static_cast<double>(iters);
    double ips = items > 0 ? static_cast<double>(items) / secs : 0.0;
    std::printf(
        "{\"name\": \"%s\", \"ns_per_iter\": %.1f, \"iterations\": "
        "%" PRId64 ", \"items_per_second\": %.1f}\n",
        b->name.c_str(), ns, iters, ips);
    std::fflush(stdout);
  }
  return 0;
}

}  // namespace benchmark

#define BENCHMARK_PRIVATE_CONCAT2(a, b) a##b
#define BENCHMARK_PRIVATE_CONCAT(a, b) BENCHMARK_PRIVATE_CONCAT2(a, b)
// Variadic: template-ids with commas arrive as multiple arguments and are
// reassembled by __VA_ARGS__.
#define BENCHMARK(...)                                               \
  static ::benchmark::Bench *BENCHMARK_PRIVATE_CONCAT(benchmark_reg_, \
                                                      __LINE__) =     \
      ::benchmark::Register(                                          \
          #__VA_ARGS__,                                               \
          [](::benchmark::State &st) { (__VA_ARGS__)(st); })

int main(int argc, char **argv) { return benchmark::RunAll(argc, argv); }
