// Native QP oracle — an independent C++ double-precision implementation of
// the on-device ADMM quadratic-program solver (ops/qp.py), used to
// cross-validate the TPU solver the same way the dynamics oracle
// (dynamics_oracle.cpp) cross-validates the simulation core.
//
// The reference's controllers lean on battle-tested host C++ solvers
// (IPOPT / qpOASES / HPIPM via CasADi and acados, reference
// controllers/mpc/mpc.py:170-246, mpc_acados.py:164-175); our rebuild
// replaced those with a jitted f32 ADMM on the MXU. This file restores the
// "second implementation in another language" safety net: the same
// algorithm written independently against the OSQP paper, in f64, with its
// own dense Cholesky/LU. Agreement on random and MPC-shaped instances
// certifies the device solver end to end (equilibration, staging, polish);
// it also doubles as a host-side solver for tiny QPs where a device
// dispatch is not worth the latency.
//
// Solves:  min 0.5 x'Px + q'x   s.t.  l <= Ax <= u   (dense P, A)
// C ABI for ctypes (no pybind11 in the image).

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// -- dense linear algebra (row-major) ---------------------------------------

// Cholesky factorization in place: M = L L', lower triangle kept.
// Returns false if a pivot is not positive.
bool cholesky(std::vector<double>& M, int n) {
  for (int j = 0; j < n; ++j) {
    double d = M[j * n + j];
    for (int k = 0; k < j; ++k) d -= M[j * n + k] * M[j * n + k];
    if (d <= 0.0) return false;
    d = std::sqrt(d);
    M[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double s = M[i * n + j];
      for (int k = 0; k < j; ++k) s -= M[i * n + k] * M[j * n + k];
      M[i * n + j] = s / d;
    }
  }
  return true;
}

void chol_solve(const std::vector<double>& L, int n, double* b) {
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * b[k];
    b[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * b[k];
    b[i] = s / L[i * n + i];
  }
}

// LU with partial pivoting, in place; piv holds row swaps.
bool lu_factor(std::vector<double>& M, std::vector<int>& piv, int n) {
  piv.resize(n);
  for (int k = 0; k < n; ++k) {
    int p = k;
    double best = std::fabs(M[k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      double v = std::fabs(M[i * n + k]);
      if (v > best) { best = v; p = i; }
    }
    if (best == 0.0) return false;
    piv[k] = p;
    if (p != k)
      for (int j = 0; j < n; ++j) std::swap(M[k * n + j], M[p * n + j]);
    const double pivot = M[k * n + k];
    for (int i = k + 1; i < n; ++i) {
      const double f = M[i * n + k] / pivot;
      M[i * n + k] = f;
      for (int j = k + 1; j < n; ++j) M[i * n + j] -= f * M[k * n + j];
    }
  }
  return true;
}

void lu_solve(const std::vector<double>& M, const std::vector<int>& piv,
              int n, double* b) {
  for (int k = 0; k < n; ++k) {
    if (piv[k] != k) std::swap(b[k], b[piv[k]]);
    for (int i = k + 1; i < n; ++i) b[i] -= M[i * n + k] * b[k];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= M[i * n + k] * b[k];
    b[i] = s / M[i * n + i];
  }
}

inline double clip(double v, double lo, double hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// y = M x  (rows x cols, row-major)
void matvec(const double* M, const double* x, double* y, int rows, int cols) {
  for (int i = 0; i < rows; ++i) {
    double s = 0.0;
    for (int j = 0; j < cols; ++j) s += M[i * cols + j] * x[j];
    y[i] = s;
  }
}

// y = M' x
void matTvec(const double* M, const double* x, double* y, int rows,
             int cols) {
  for (int j = 0; j < cols; ++j) y[j] = 0.0;
  for (int i = 0; i < rows; ++i) {
    const double xi = x[i];
    if (xi == 0.0) continue;
    for (int j = 0; j < cols; ++j) y[j] += M[i * cols + j] * xi;
  }
}

struct Work {
  int n, m;
  std::vector<double> P, A, q, l, u;       // equilibrated problem
  std::vector<double> c, d;                // column / row scalings
  std::vector<double> x, z, y;
  std::vector<double> rho_vec;
  std::vector<char> eq;
};

// Residuals in the equilibrated scaling, matching ops/qp.py's reporting:
// primal = max violation of [l, u]; dual = ||Px + q + A'y||_inf.
void residuals(const Work& w, double* pr, double* dr) {
  std::vector<double> Ax(w.m), Px(w.n), Aty(w.n);
  matvec(w.A.data(), w.x.data(), Ax.data(), w.m, w.n);
  double p = 0.0;
  for (int i = 0; i < w.m; ++i) {
    const double v = Ax[i] - clip(Ax[i], w.l[i], w.u[i]);
    p = std::max(p, std::fabs(v));
  }
  matvec(w.P.data(), w.x.data(), Px.data(), w.n, w.n);
  matTvec(w.A.data(), w.y.data(), Aty.data(), w.m, w.n);
  double dd = 0.0;
  for (int j = 0; j < w.n; ++j)
    dd = std::max(dd, std::fabs(Px[j] + w.q[j] + Aty[j]));
  *pr = p;
  *dr = dd;
}

// One exact active-set KKT solve at margin eps_act; accept only if both
// residuals improve (same acceptance rule as the device polish).
void try_polish(Work& w, double sigma, double eps_act, double* pr,
                double* dr) {
  const int n = w.n, m = w.m, N = n + m;
  std::vector<double> Ax(m);
  matvec(w.A.data(), w.x.data(), Ax.data(), m, n);
  std::vector<char> act(m);
  std::vector<double> b(m);
  for (int i = 0; i < m; ++i) {
    const bool al = std::isfinite(w.l[i]) && (Ax[i] - w.l[i]) < eps_act;
    const bool au = std::isfinite(w.u[i]) && (w.u[i] - Ax[i]) < eps_act;
    act[i] = (al || au) ? 1 : 0;
    b[i] = act[i] ? (au ? w.u[i] : w.l[i]) : 0.0;
  }
  // Saddle system [[P + sigma I, Aact'], [Aact, -eps diag]] with inactive
  // rows zeroed and given a unit dual diagonal (their multipliers -> 0).
  std::vector<double> M(static_cast<size_t>(N) * N, 0.0);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      M[i * N + j] = w.P[i * n + j] + (i == j ? sigma : 0.0);
  for (int i = 0; i < m; ++i) {
    const double a = act[i] ? 1.0 : 0.0;
    for (int j = 0; j < n; ++j) {
      const double v = w.A[i * n + j] * a;
      M[(n + i) * N + j] = v;
      M[j * N + (n + i)] = v;
    }
    M[(n + i) * N + (n + i)] = act[i] ? -1e-7 : -1.0;
  }
  std::vector<double> rhs(N);
  for (int j = 0; j < n; ++j) rhs[j] = -w.q[j];
  for (int i = 0; i < m; ++i) rhs[n + i] = b[i];
  std::vector<double> Mf(M);
  std::vector<int> piv;
  if (!lu_factor(Mf, piv, N)) return;
  std::vector<double> sol(rhs);
  lu_solve(Mf, piv, N, sol.data());
  // One iterative-refinement pass.
  std::vector<double> r(N);
  matvec(M.data(), sol.data(), r.data(), N, N);
  for (int i = 0; i < N; ++i) r[i] = rhs[i] - r[i];
  lu_solve(Mf, piv, N, r.data());
  for (int i = 0; i < N; ++i) sol[i] += r[i];

  Work cand = w;
  for (int j = 0; j < n; ++j) cand.x[j] = sol[j];
  for (int i = 0; i < m; ++i) cand.y[i] = sol[n + i];
  double pr_p, dr_p;
  residuals(cand, &pr_p, &dr_p);
  if (pr_p <= std::max(*pr, 1e-6) && dr_p <= *dr) {
    w.x = cand.x;
    w.y = cand.y;
    *pr = pr_p;
    *dr = dr_p;
  }
}

}  // namespace

extern "C" {

// Returns 0 on success. x_out (n), y_out (m), res_out = {prim, dual} in the
// equilibrated scaling (scale-free feasibility, same convention as the
// device solver's QPSolution). x0/y0 may be null for a cold start.
int qp_solve(const double* P_in, const double* q_in, const double* A_in,
             const double* l_in, const double* u_in, int n, int m,
             const double* x0, const double* y0, double rho0, double sigma,
             double alpha, int iters, double tol, int polish, double* x_out,
             double* y_out, double* res_out) {
  Work w;
  w.n = n;
  w.m = m;
  w.P.assign(P_in, P_in + static_cast<size_t>(n) * n);
  w.A.assign(A_in, A_in + static_cast<size_t>(m) * n);
  w.q.assign(q_in, q_in + n);
  w.l.assign(l_in, l_in + m);
  w.u.assign(u_in, u_in + m);
  w.c.assign(n, 1.0);
  w.d.assign(m, 1.0);

  // Ruiz equilibration, 3 sweeps: joint column norms over [P; A], then row
  // norms of A. Jacobi-style like the device solver (ops/qp.py:110-121):
  // ALL norms of a phase are computed from the matrices as they stood at
  // the phase start, THEN applied — scaling columns sequentially would
  // fold earlier columns' symmetric P-updates into later columns' norms
  // and land in a different scaling than the device QPSolution.
  std::vector<double> dc(n), drr(m);
  for (int sweep = 0; sweep < 3; ++sweep) {
    for (int j = 0; j < n; ++j) {
      double cn = 0.0;
      for (int i = 0; i < n; ++i)
        cn = std::max(cn, std::fabs(w.P[i * n + j]));
      for (int i = 0; i < m; ++i)
        cn = std::max(cn, std::fabs(w.A[i * n + j]));
      dc[j] = 1.0 / std::sqrt(clip(cn, 1e-8, 1e300));
    }
    for (int j = 0; j < n; ++j) {
      for (int i = 0; i < n; ++i) w.P[i * n + j] *= dc[j] * dc[i];
      for (int i = 0; i < m; ++i) w.A[i * n + j] *= dc[j];
      w.c[j] *= dc[j];
    }
    for (int i = 0; i < m; ++i) {
      double rn = 0.0;
      for (int j = 0; j < n; ++j)
        rn = std::max(rn, std::fabs(w.A[i * n + j]));
      drr[i] = 1.0 / clip(rn, 1e-8, 1e300);
    }
    for (int i = 0; i < m; ++i) {
      for (int j = 0; j < n; ++j) w.A[i * n + j] *= drr[i];
      w.d[i] *= drr[i];
    }
  }
  for (int j = 0; j < n; ++j) w.q[j] *= w.c[j];
  for (int i = 0; i < m; ++i) {
    if (std::isfinite(w.l[i])) w.l[i] *= w.d[i];
    if (std::isfinite(w.u[i])) w.u[i] *= w.d[i];
  }
  w.x.assign(n, 0.0);
  w.y.assign(m, 0.0);
  if (x0)
    for (int j = 0; j < n; ++j) w.x[j] = x0[j] / w.c[j];
  if (y0)
    for (int i = 0; i < m; ++i) w.y[i] = y0[i] / w.d[i];
  w.z.resize(m);
  {
    std::vector<double> Ax(m);
    matvec(w.A.data(), w.x.data(), Ax.data(), m, n);
    for (int i = 0; i < m; ++i) w.z[i] = clip(Ax[i], w.l[i], w.u[i]);
  }
  w.eq.resize(m);
  for (int i = 0; i < m; ++i) w.eq[i] = (w.u[i] - w.l[i]) < 1e-9 ? 1 : 0;

  // Stage schedule: geometric halving (ascending) when tol-gated, uniform
  // otherwise — the same budget layout as the device solver.
  const int n_stages = 10;
  std::vector<int> sizes(n_stages);
  if (tol > 0.0) {
    std::vector<int> desc;
    int rem = iters;
    for (int k = 0; k < n_stages - 1; ++k) {
      int half = std::max(rem / 2, 4);
      desc.push_back(half);
      rem = std::max(rem - half, 1);
    }
    desc.push_back(std::max(rem, 1));
    for (int k = 0; k < n_stages; ++k) sizes[k] = desc[n_stages - 1 - k];
  } else {
    for (int k = 0; k < n_stages; ++k)
      sizes[k] = std::max(iters / n_stages, 1);
  }

  double rho = rho0;
  double pr = 1e300, dr = 1e300;
  w.rho_vec.resize(m);
  std::vector<double> K(static_cast<size_t>(n) * n);
  std::vector<double> rhs(n), Ax(m), tmp_n(n);
  for (int stage = 0; stage < n_stages; ++stage) {
    if (tol > 0.0 && pr <= tol && dr <= 10.0 * tol) break;
    for (int i = 0; i < m; ++i) w.rho_vec[i] = w.eq[i] ? rho * 1e3 : rho;
    // K = P + sigma I + A' diag(rho) A
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        K[i * n + j] = w.P[i * n + j] + (i == j ? sigma : 0.0);
    for (int r = 0; r < m; ++r) {
      const double rv = w.rho_vec[r];
      for (int i = 0; i < n; ++i) {
        const double ai = w.A[r * n + i] * rv;
        if (ai == 0.0) continue;
        for (int j = 0; j < n; ++j) K[i * n + j] += ai * w.A[r * n + j];
      }
    }
    std::vector<double> L(K);
    if (!cholesky(L, n)) return 1;
    for (int it = 0; it < sizes[stage]; ++it) {
      // x-step: (P + sigma I + A' rho A) x = sigma x - q + A'(rho z - y)
      for (int i = 0; i < m; ++i)
        Ax[i] = w.rho_vec[i] * w.z[i] - w.y[i];
      matTvec(w.A.data(), Ax.data(), tmp_n.data(), m, n);
      for (int j = 0; j < n; ++j)
        rhs[j] = sigma * w.x[j] - w.q[j] + tmp_n[j];
      chol_solve(L, n, rhs.data());
      for (int j = 0; j < n; ++j) w.x[j] = rhs[j];
      matvec(w.A.data(), w.x.data(), Ax.data(), m, n);
      for (int i = 0; i < m; ++i) {
        const double axr = alpha * Ax[i] + (1.0 - alpha) * w.z[i];
        const double zi = clip(axr + w.y[i] / w.rho_vec[i], w.l[i], w.u[i]);
        w.y[i] += w.rho_vec[i] * (axr - zi);
        w.z[i] = zi;
      }
    }
    // rho adaptation from the raw ||Ax - z|| / dual-residual ratio.
    matvec(w.A.data(), w.x.data(), Ax.data(), m, n);
    double pr_raw = 1e-12;
    for (int i = 0; i < m; ++i)
      pr_raw = std::max(pr_raw, std::fabs(Ax[i] - w.z[i]));
    residuals(w, &pr, &dr);
    const double scale = clip(std::sqrt(pr_raw / (dr + 1e-12)), 0.2, 5.0);
    rho = clip(rho * scale, 1e-4, 1e4);
  }
  residuals(w, &pr, &dr);
  if (polish) {
    const double margins[3] = {1e-4, 1e-3, std::max(1e-4, 5.0 * pr)};
    for (double eps_act : margins) try_polish(w, sigma, eps_act, &pr, &dr);
  }
  for (int j = 0; j < n; ++j) x_out[j] = w.x[j] * w.c[j];
  for (int i = 0; i < m; ++i) y_out[i] = w.y[i] * w.d[i];
  res_out[0] = pr;
  res_out[1] = dr;
  return 0;
}

}  // extern "C"
