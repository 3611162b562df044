// Minimal MLPerf-LoadGen-style load generator (C++), driven from Python via
// ctypes. TPU twin of the vendored mlcommons LoadGen the reference uses
// (`dlrm_v3/inference/thirdparty/loadgen/`, ~9.2k LoC; wired in
// `dlrm_v3/inference/main.py:281-357`): scenario schedules (Offline /
// Server-Poisson / SingleStream / MultiStream), issue-thread + completion
// tracking, latency percentile reporting (p50..p99.9, `main.py:167-199`),
// latency-bound pass/fail, and the single/multi-stream early-stopping
// criterion (`loadgen/early_stopping.cc`): stop once the observed
// overlatency count statistically bounds the target percentile at 99%
// confidence.
//
// C API (no pybind — Python uses ctypes; callbacks are CFUNCTYPE pointers):
//   lg_start_test(settings, issue_cb)   -- blocks until test completes
//   lg_query_complete(query_id)         -- SUT calls when a query finishes
//   lg_query_count() / lg_achieved_qps() / lg_latency_ns(percentile)
//   lg_early_stopped() / lg_latency_bound_ok()
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
  kMultiStream = 3,
};

struct Settings {
  int32_t scenario;
  double target_qps;        // Server: Poisson arrival rate
  int64_t min_query_count;  // queries to issue
  int64_t min_duration_ms;  // keep issuing until both minimums are met
  int64_t seed;
  // latency constraint (0 = unconstrained): per-query target and the
  // percentile it must hold at (MLPerf: p90 SingleStream, p99 Multi/Server)
  int64_t target_latency_ns;
  double target_percentile;  // e.g. 0.90 / 0.99
  int32_t enable_early_stopping;  // SingleStream/MultiStream only
};

struct State {
  std::mutex mu;
  std::condition_variable cv;
  std::vector<Clock::time_point> issue_ts;
  std::vector<Clock::time_point> complete_ts;
  std::atomic<int64_t> completed{0};
  int64_t issued = 0;
  bool early_stopped = false;
  Clock::time_point start, end;
};

State g_state;
Settings g_settings;

// MLPerf early-stopping criterion (`early_stopping.cc` MinPassingQueries):
// with t overlatency results observed, the minimum number of processed
// queries n such that  P[Binomial(n, 1 - p) <= t] <= 1 - confidence,
// i.e. seeing at most t failures in n trials would be this unlikely if the
// true overlatency rate exceeded (1 - p). Computed with log-space binomial
// tail to avoid overflow. confidence = 0.99.
int64_t min_queries_for_early_stop(int64_t t, double p) {
  const double conf = 0.99;
  const double q = 1.0 - p;  // allowed failure rate
  const double log_alpha = std::log(1.0 - conf);
  auto log_binom_tail = [&](int64_t n) {
    // log P[X <= t], X ~ Binomial(n, q)
    double lp = std::log(p), lq = std::log(q);
    double lc = 0.0;  // log C(n, 0)
    double max_term = -1e300;
    std::vector<double> terms;
    for (int64_t i = 0; i <= t; ++i) {
      if (i > 0) lc += std::log(double(n - i + 1)) - std::log(double(i));
      double term = lc + double(i) * lq + double(n - i) * lp;
      terms.push_back(term);
      max_term = std::max(max_term, term);
    }
    double s = 0.0;
    for (double v : terms) s += std::exp(v - max_term);
    return max_term + std::log(s);
  };
  // grow n geometrically, then binary search the boundary
  int64_t lo = t + 1, hi = std::max<int64_t>(2 * (t + 1), 64);
  while (log_binom_tail(hi) > log_alpha) {
    lo = hi;
    hi *= 2;
    if (hi > (int64_t(1) << 40)) return hi;  // give up: effectively never
  }
  while (lo < hi) {
    int64_t mid = lo + (hi - lo) / 2;
    if (log_binom_tail(mid) > log_alpha) {
      lo = mid + 1;
    } else {
      hi = mid;
    }
  }
  return lo;
}

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
  g_settings = settings;
  {
    std::lock_guard<std::mutex> lock(st.mu);
    st.issue_ts.clear();
    st.complete_ts.clear();
    st.completed.store(0);
    st.issued = 0;
    st.early_stopped = false;
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

  // stream scenarios: overlatency bookkeeping for early stopping
  int64_t overlatency = 0;
  auto query_latency_ns = [&](int64_t qid) {
    std::lock_guard<std::mutex> lock(st.mu);
    return std::chrono::duration_cast<std::chrono::nanoseconds>(
               st.complete_ts[qid] - st.issue_ts[qid])
        .count();
  };
  auto stream_should_stop = [&](int64_t n_done) {
    if (n_done < settings.min_query_count) return false;
    if (Clock::now() < min_end) return false;
    if (!settings.enable_early_stopping || settings.target_latency_ns <= 0)
      return true;  // plain minimums
    int64_t need = min_queries_for_early_stop(
        overlatency, settings.target_percentile > 0
                         ? settings.target_percentile
                         : 0.9);
    if (n_done >= need) {
      std::lock_guard<std::mutex> lock(st.mu);
      st.early_stopped = true;
      return true;
    }
    // unreachable bound: when the overlatency rate exceeds the allowed
    // rate, need grows faster than n and the run would never terminate —
    // give up (latency_bound_ok will report the failure)
    if (need > 64 * std::max<int64_t>(settings.min_query_count, 512)) {
      return true;
    }
    return false;
  };

  int64_t qid = 0;
  if (settings.scenario == kOffline) {
    // Offline: all queries available immediately; issue back-to-back.
    while (qid < settings.min_query_count || Clock::now() < min_end) {
      issue_one(qid++);
      if (qid >= settings.min_query_count && Clock::now() >= min_end) break;
    }
  } else if (settings.scenario == kSingleStream ||
             settings.scenario == kMultiStream) {
    // next query only after the previous completes (MultiStream = same
    // schedule; the SUT processes samples_per_query samples per issue and
    // the latency metric is per N-sample query)
    for (;;) {
      issue_one(qid);
      {
        std::unique_lock<std::mutex> lock(st.mu);
        int64_t want = qid + 1;
        st.cv.wait(lock, [&] { return st.completed.load() >= want; });
      }
      if (settings.target_latency_ns > 0 &&
          query_latency_ns(qid) > settings.target_latency_ns) {
        overlatency++;
      }
      qid++;
      if (stream_should_stop(qid)) break;
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

int32_t lg_early_stopped() { return g_state.early_stopped ? 1 : 0; }

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

// 1 if the configured target percentile latency is within the target bound
// (the MLPerf "result valid" latency constraint); -1 if unconstrained
int32_t lg_latency_bound_ok() {
  if (g_settings.target_latency_ns <= 0) return -1;
  double pct = (g_settings.target_percentile > 0
                    ? g_settings.target_percentile
                    : 0.9) *
               100.0;
  int64_t observed = lg_latency_ns(pct);
  return (observed >= 0 && observed <= g_settings.target_latency_ns) ? 1 : 0;
}

// exposed for tests: minimum processed queries to early-stop with t
// overlatency results at percentile p (confidence 0.99)
int64_t lg_min_queries_for_early_stop(int64_t t, double p) {
  return min_queries_for_early_stop(t, p);
}

}  // extern "C"
