// qp_oracle: clean-room dense primal active-set QP solver (C ABI).
//
// The role qpOASES plays in the reference stack (SolverMPC.cpp:702-712) --
// an exact double-precision dense QP solve -- rebuilt from the textbook
// primal active-set method (Nocedal & Wright, "Numerical Optimization",
// Alg. 16.3) with two-sided linear constraints:
//
//     min 1/2 x^T H x + g^T x    s.t.   lb <= A x <= ub
//
// H must be symmetric positive definite (true for the Hector QP family:
// H = 2(B^T S B + Alpha) with Alpha > 0).  Used as the host-side oracle for
// validating the batched TPU interior-point solver (hector/qp/ref_check.py)
// and as the reference implementation for tolerance transfer.  NOT a port
// of qpOASES: different method (no parametric hot starts), own linear
// algebra below.
//
// Build: g++ -O2 -shared -fPIC -o libqp_oracle.so qp_oracle.cpp

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// ---- minimal dense linear algebra (row-major) ----

// In-place Cholesky factorization M = L L^T (lower triangle of m).
bool cholesky(std::vector<double>& m, int n) {
  for (int j = 0; j < n; ++j) {
    double d = m[j * n + j];
    for (int k = 0; k < j; ++k) d -= m[j * n + k] * m[j * n + k];
    if (d <= 0.0) return false;
    const double l = std::sqrt(d);
    m[j * n + j] = l;
    for (int i = j + 1; i < n; ++i) {
      double s = m[i * n + j];
      for (int k = 0; k < j; ++k) s -= m[i * n + k] * m[j * n + k];
      m[i * n + j] = s / l;
    }
  }
  return true;
}

// Solve L L^T x = b given the Cholesky factor (lower triangle of l).
void chol_solve(const std::vector<double>& l, int n, const double* b,
                double* x) {
  // forward
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= l[i * n + k] * x[k];
    x[i] = s / l[i * n + i];
  }
  // backward
  for (int i = n - 1; i >= 0; --i) {
    double s = x[i];
    for (int k = i + 1; k < n; ++k) s -= l[k * n + i] * x[k];
    x[i] = s / l[i * n + i];
  }
}

}  // namespace

extern "C" {

// Returns 0 on success, 1 on iteration limit (x still holds best iterate),
// 2 if H is not positive definite, 3 if an equality subproblem is singular.
//
// H: n*n row-major; A: m*n row-major; x: out, length n.
// Rows with lb <= -big_threshold / ub >= +big_threshold are one-sided.
int qp_oracle_solve(int n, int m, const double* H, const double* g,
                    const double* A, const double* lb, const double* ub,
                    double* x_out, int max_iter, double tol,
                    double big_threshold) {
  std::vector<double> Lh(H, H + (size_t)n * n);
  if (!cholesky(Lh, n)) return 2;

  // Hinv columns of A^T, i.e. Z[i] = H^-1 a_i, computed lazily per row.
  std::vector<std::vector<double>> hinv_a(m);
  auto get_hinv_a = [&](int row) -> const std::vector<double>& {
    if (hinv_a[row].empty()) {
      hinv_a[row].resize(n);
      chol_solve(Lh, n, A + (size_t)row * n, hinv_a[row].data());
    }
    return hinv_a[row];
  };

  std::vector<double> hinv_g(n);
  chol_solve(Lh, n, g, hinv_g.data());

  std::vector<double> x(n, 0.0);  // x = 0 is feasible for the Hector family
  // working set: rows with the active side (+1 upper, -1 lower)
  std::vector<int> wrow, wside;
  std::vector<double> ax(m);

  auto dot = [&](const double* a, const double* b) {
    double s = 0.0;
    for (int k = 0; k < n; ++k) s += a[k] * b[k];
    return s;
  };

  for (int it = 0; it < max_iter; ++it) {
    // Solve the equality-constrained subproblem on the working set:
    //   min 1/2 (x+d)^T H (x+d) + g^T (x+d)   s.t.  A_W d = 0
    // via the Schur complement S = A_W H^-1 A_W^T:
    //   S mu = A_W (x + H^-1 g);  d = -x - H^-1 g + H^-1 A_W^T mu
    const int k = (int)wrow.size();
    std::vector<double> mu(k, 0.0);
    std::vector<double> d(n);
    // r = x + H^-1 g
    std::vector<double> r(n);
    for (int i = 0; i < n; ++i) r[i] = x[i] + hinv_g[i];
    if (k > 0) {
      std::vector<double> S((size_t)k * k);
      std::vector<double> rhs(k);
      for (int i = 0; i < k; ++i) {
        const auto& zi = get_hinv_a(wrow[i]);
        for (int j = 0; j <= i; ++j) {
          const double* aj = A + (size_t)wrow[j] * n;
          S[i * k + j] = S[j * k + i] = dot(aj, zi.data());
        }
        S[i * k + i] += 1e-12;  // regularize near-duplicate rows
        rhs[i] = dot(A + (size_t)wrow[i] * n, r.data());
      }
      if (!cholesky(S, k)) return 3;
      chol_solve(S, k, rhs.data(), mu.data());
    }
    for (int i = 0; i < n; ++i) d[i] = -r[i];
    for (int i = 0; i < k; ++i) {
      const auto& zi = get_hinv_a(wrow[i]);
      for (int j = 0; j < n; ++j) d[j] += mu[i] * zi[j];
    }

    double dnorm = 0.0;
    for (int i = 0; i < n; ++i) dnorm = std::max(dnorm, std::fabs(d[i]));

    if (dnorm < tol) {
      // KKT multiplier signs: lower-active need mu >= 0, upper-active
      // mu <= 0 (stationarity H x + g = sum mu_i a_i).
      int drop = -1;
      double worst = -tol;
      for (int i = 0; i < k; ++i) {
        const double v = (wside[i] < 0) ? mu[i] : -mu[i];
        if (v < worst) { worst = v; drop = i; }
      }
      if (drop < 0) break;  // optimal
      wrow.erase(wrow.begin() + drop);
      wside.erase(wside.begin() + drop);
      continue;
    }

    // ratio test against non-working constraints (both sides)
    double alpha = 1.0;
    int block_row = -1, block_side = 0;
    for (int i = 0; i < m; ++i) {
      bool in_w = false;
      for (int j = 0; j < (int)wrow.size(); ++j)
        if (wrow[j] == i) { in_w = true; break; }
      if (in_w) continue;
      const double* ai = A + (size_t)i * n;
      const double ad = dot(ai, d.data());
      const double axi = dot(ai, x.data());
      if (ad > tol && ub[i] < big_threshold) {
        const double a = (ub[i] - axi) / ad;
        if (a < alpha) { alpha = a; block_row = i; block_side = +1; }
      } else if (ad < -tol && lb[i] > -big_threshold) {
        const double a = (lb[i] - axi) / ad;
        if (a < alpha) { alpha = a; block_row = i; block_side = -1; }
      }
    }
    if (alpha < 0.0) alpha = 0.0;
    for (int i = 0; i < n; ++i) x[i] += alpha * d[i];
    if (block_row >= 0 && alpha < 1.0) {
      wrow.push_back(block_row);
      wside.push_back(block_side);
    }
    if (it == max_iter - 1) {
      std::memcpy(x_out, x.data(), n * sizeof(double));
      return 1;
    }
  }

  std::memcpy(x_out, x.data(), n * sizeof(double));
  return 0;
}

}  // extern "C"
