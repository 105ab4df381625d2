// scenario_gen: native host-side scenario batch generator (C ABI).
//
// The host half of the SURVEY.md §2.4 "host pipeline": scenario generation
// on the host CPU, overlapped with device compute (the data-loader analog).
// Fills a row-major (batch, 11) float32 buffer with scenario commands over
// the reference's teleop envelope (FSMState_Walking.cpp:30-33):
//
//   col 0  vx        in [-0.75, 0.75] m/s
//   col 1  vy        in [-0.25, 0.25] m/s
//   col 2  yaw_rate  in [-1.5, 1.5] rad/s
//   col 3  roll      (0)
//   col 4  pitch     (0)
//   col 5  gait offset L   (walking 0 / standing 0)
//   col 6  gait offset R   (walking 5 / standing 0)
//   col 7  gait duration L (walking 5 / standing 10)
//   col 8  gait duration R (walking 5 / standing 10)
//   col 9  terrain step height (0 flat; stairs scenarios uniform
//          [0.01, max_step_height])
//   col 10 terrain step length (0.5)
//
// Deterministic in (seed, row index): row i is generated from
// splitmix64(seed, i), so any sub-range of a batch can be regenerated
// independently (useful for sharded multi-host generation where each host
// fills only its rows).
//
// Build: g++ -O2 -shared -fPIC -o libscenario_gen.so scenario_gen.cpp

#include <cstdint>

namespace {

// splitmix64: tiny, high-quality 64-bit mixer (public-domain algorithm).
inline uint64_t mix64(uint64_t z) {
  z += 0x9e3779b97f4a7c15ULL;
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed, uint64_t stream)
      : state(mix64(seed ^ mix64(stream))) {}
  uint64_t next_u64() {
    state = mix64(state);
    return state;
  }
  // uniform in [0, 1)
  float next_f32() {
    return static_cast<float>(next_u64() >> 40) * (1.0f / 16777216.0f);
  }
  float uniform(float lo, float hi) { return lo + (hi - lo) * next_f32(); }
};

}  // namespace

extern "C" {

// Fill rows [row_begin, row_end) of a (batch, 11) scenario buffer.
// `out` points at row row_begin (i.e. the caller's slice), so multi-host
// callers pass their own shard only.
void generate_scenarios(uint64_t seed, int64_t row_begin, int64_t row_end,
                        float p_standing, float p_stairs,
                        float max_step_height, float* out) {
  for (int64_t i = row_begin; i < row_end; ++i) {
    Rng rng(seed, static_cast<uint64_t>(i));
    float* r = out + (i - row_begin) * 11;
    const bool standing = rng.next_f32() < p_standing;
    const float vx = rng.uniform(-0.75f, 0.75f);
    const float vy = rng.uniform(-0.25f, 0.25f);
    const float wz = rng.uniform(-1.5f, 1.5f);
    r[0] = standing ? 0.0f : vx;
    r[1] = standing ? 0.0f : vy;
    r[2] = standing ? 0.0f : wz;
    r[3] = 0.0f;  // roll
    r[4] = 0.0f;  // pitch
    r[5] = 0.0f;
    r[6] = standing ? 0.0f : 5.0f;
    r[7] = standing ? 10.0f : 5.0f;
    r[8] = standing ? 10.0f : 5.0f;
    const bool stairs = rng.next_f32() < p_stairs;
    const float h = rng.uniform(0.01f, max_step_height);
    r[9] = stairs ? h : 0.0f;
    r[10] = 0.5f;
  }
}

}  // extern "C"
