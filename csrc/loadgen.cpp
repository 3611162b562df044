// Minimal MLPerf-LoadGen-style load generator (C++), driven from Python via
// ctypes. TPU twin of the vendored mlcommons LoadGen the reference uses
// (`dlrm_v3/inference/thirdparty/loadgen/`, ~9.2k LoC; wired in
// `dlrm_v3/inference/main.py:281-357`): scenario schedules (Offline /
// Server-Poisson / SingleStream), issue-thread + completion tracking, and
// latency percentile reporting (p50..p99.9, `main.py:167-199`).
//
// C API (no pybind — Python uses ctypes; callbacks are CFUNCTYPE pointers):
//   lg_start_test(settings, issue_cb)   -- blocks until test completes
//   lg_query_complete(query_id)         -- SUT calls when a query finishes
//   lg_query_count() / lg_achieved_qps() / lg_latency_ns(percentile)
//
// Build: g++ -O2 -shared -fPIC -pthread -o libloadgen.so loadgen.cpp

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

enum Scenario : int32_t {
  kOffline = 0,
  kServer = 1,
  kSingleStream = 2,
};

struct Settings {
  int32_t scenario;
  double target_qps;        // Server: Poisson arrival rate
  int64_t min_query_count;  // queries to issue
  int64_t min_duration_ms;  // keep issuing until both minimums are met
  int64_t seed;
};

struct State {
  std::mutex mu;
  std::condition_variable cv;
  std::vector<Clock::time_point> issue_ts;
  std::vector<Clock::time_point> complete_ts;
  std::atomic<int64_t> completed{0};
  int64_t issued = 0;
  Clock::time_point start, end;
};

State g_state;

}  // namespace

extern "C" {

typedef void (*IssueCallback)(int64_t query_id);

void lg_query_complete(int64_t query_id) {
  std::lock_guard<std::mutex> lock(g_state.mu);
  if (query_id >= 0 &&
      query_id < static_cast<int64_t>(g_state.complete_ts.size())) {
    g_state.complete_ts[query_id] = Clock::now();
  }
  g_state.completed.fetch_add(1);
  g_state.cv.notify_all();
}

void lg_start_test(Settings settings, IssueCallback issue_cb) {
  auto& st = g_state;
  {
    std::lock_guard<std::mutex> lock(st.mu);
    st.issue_ts.clear();
    st.complete_ts.clear();
    st.completed.store(0);
    st.issued = 0;
  }
  std::mt19937_64 rng(settings.seed);
  std::exponential_distribution<double> interarrival(
      settings.target_qps > 0 ? settings.target_qps : 1.0);

  st.start = Clock::now();
  const auto min_end =
      st.start + std::chrono::milliseconds(settings.min_duration_ms);

  auto issue_one = [&](int64_t qid) {
    {
      std::lock_guard<std::mutex> lock(st.mu);
      st.issue_ts.push_back(Clock::now());
      st.complete_ts.push_back(Clock::time_point{});
      st.issued++;
    }
    issue_cb(qid);  // re-enters Python (ctypes grabs the GIL)
  };

  int64_t qid = 0;
  if (settings.scenario == kOffline) {
    // Offline: all queries available immediately; issue back-to-back.
    while (qid < settings.min_query_count || Clock::now() < min_end) {
      issue_one(qid++);
      if (qid >= settings.min_query_count && Clock::now() >= min_end) break;
    }
  } else if (settings.scenario == kSingleStream) {
    // next query only after the previous completes
    while (qid < settings.min_query_count || Clock::now() < min_end) {
      issue_one(qid);
      std::unique_lock<std::mutex> lock(st.mu);
      int64_t want = qid + 1;
      st.cv.wait(lock, [&] { return st.completed.load() >= want; });
      qid++;
    }
  } else {  // Server: Poisson arrivals at target_qps
    auto next = Clock::now();
    while (qid < settings.min_query_count || Clock::now() < min_end) {
      next += std::chrono::nanoseconds(
          static_cast<int64_t>(interarrival(rng) * 1e9));
      std::this_thread::sleep_until(next);
      issue_one(qid++);
    }
  }
  // drain
  {
    std::unique_lock<std::mutex> lock(st.mu);
    st.cv.wait(lock, [&] { return st.completed.load() >= st.issued; });
  }
  st.end = Clock::now();
}

int64_t lg_query_count() { return g_state.issued; }

double lg_achieved_qps() {
  double secs =
      std::chrono::duration<double>(g_state.end - g_state.start).count();
  return secs > 0 ? static_cast<double>(g_state.issued) / secs : 0.0;
}

// latency percentile in nanoseconds (p in [0, 100])
int64_t lg_latency_ns(double p) {
  std::vector<int64_t> lat;
  {
    std::lock_guard<std::mutex> lock(g_state.mu);
    lat.reserve(g_state.issue_ts.size());
    for (size_t i = 0; i < g_state.issue_ts.size(); ++i) {
      if (g_state.complete_ts[i] != Clock::time_point{}) {
        lat.push_back(std::chrono::duration_cast<std::chrono::nanoseconds>(
                          g_state.complete_ts[i] - g_state.issue_ts[i])
                          .count());
      }
    }
  }
  if (lat.empty()) return -1;
  std::sort(lat.begin(), lat.end());
  size_t idx = static_cast<size_t>(
      std::min<double>(lat.size() - 1.0, std::ceil(p / 100.0 * lat.size()) - 1));
  return lat[std::max<size_t>(idx, 0)];
}

}  // extern "C"
