// Native dynamics oracle — an independent C++ implementation of the
// benchmark rigid-body dynamics, used as the ground-truth cross-validation
// reference for the JAX simulation core (the role PyBullet's C++ engine
// played for the reference: an implementation in a different language /
// compiler to catch transcription errors in the hot path).
//
// Implements, in double precision:
//   * cartpole forced dynamics (envs/dynamics.py:cartpole_dynamics_forced)
//   * 2D quadrotor dynamics (quad2d_dynamics)
//   * 3D quadrotor rigid body (quad3d_dynamics)
//   * semi-implicit Euler and RK4 integrators with n substeps
//
// Exposed with a C ABI for ctypes (no pybind11 in the image).

#include <cmath>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Cartpole: state [x, x_dot, theta, theta_dot], input force, tab force (fx, fz)
// params: [pole_mass m, cart_mass M, effective_length L, gravity g]
// ---------------------------------------------------------------------------
static void cartpole_accel(const double* s, double force, double fx,
                           double fz, const double* p, double* acc) {
  const double m = p[0], M = p[1], L = p[2], g = p[3];
  const double ml = m * L;
  const double sin_t = std::sin(s[2]), cos_t = std::cos(s[2]);
  const double a11 = M + m;
  const double a12 = ml * cos_t;
  const double a22 = (4.0 / 3.0) * m * L * L;
  const double b1 = force + fx + ml * s[3] * s[3] * sin_t;
  const double b2 = m * g * L * sin_t + fx * L * cos_t - fz * L * sin_t;
  const double det = a11 * a22 - a12 * a12;
  acc[0] = (a22 * b1 - a12 * b2) / det;  // x_ddot
  acc[1] = (a11 * b2 - a12 * b1) / det;  // theta_ddot
}

// Semi-implicit Euler advance over n substeps (PyBullet's scheme).
void cartpole_advance(double* state, double force, const double* tab_force,
                      const double* params, double dt, int n_substeps) {
  double acc[2];
  for (int k = 0; k < n_substeps; ++k) {
    cartpole_accel(state, force, tab_force[0], tab_force[1], params, acc);
    state[1] += dt * acc[0];
    state[3] += dt * acc[1];
    state[0] += dt * state[1];
    state[2] += dt * state[3];
  }
}

// RK4 single step (prior-model semantics, mpc_utils rk_discrete).
static void cartpole_deriv(const double* s, double force, const double* p,
                           double* ds) {
  double acc[2];
  const double zero2[2] = {0.0, 0.0};
  cartpole_accel(s, force, zero2[0], zero2[1], p, acc);
  ds[0] = s[1];
  ds[1] = acc[0];
  ds[2] = s[3];
  ds[3] = acc[1];
}

void cartpole_rk4(double* state, double force, const double* params,
                  double dt) {
  double k1[4], k2[4], k3[4], k4[4], tmp[4];
  cartpole_deriv(state, force, params, k1);
  for (int i = 0; i < 4; ++i) tmp[i] = state[i] + 0.5 * dt * k1[i];
  cartpole_deriv(tmp, force, params, k2);
  for (int i = 0; i < 4; ++i) tmp[i] = state[i] + 0.5 * dt * k2[i];
  cartpole_deriv(tmp, force, params, k3);
  for (int i = 0; i < 4; ++i) tmp[i] = state[i] + dt * k3[i];
  cartpole_deriv(tmp, force, params, k4);
  for (int i = 0; i < 4; ++i)
    state[i] += dt / 6.0 * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i]);
}

// ---------------------------------------------------------------------------
// 2D quadrotor: state [x, x_dot, z, z_dot, theta, theta_dot],
// input [T1, T2]; params: [mass, Iyy, arm_length, gravity]
// ---------------------------------------------------------------------------
static void quad2d_deriv(const double* s, const double* u, const double* p,
                         double* ds) {
  const double m = p[0], Iyy = p[1], L = p[2], g = p[3];
  const double total = (u[0] + u[1]) / m;
  ds[0] = s[1];
  ds[1] = std::sin(s[4]) * total;
  ds[2] = s[3];
  ds[3] = std::cos(s[4]) * total - g;
  ds[4] = s[5];
  ds[5] = L * (u[1] - u[0]) / Iyy / std::sqrt(2.0);
}

void quad2d_advance(double* state, const double* u, const double* params,
                    double dt, int n_substeps) {
  double ds[6];
  for (int k = 0; k < n_substeps; ++k) {
    quad2d_deriv(state, u, params, ds);
    state[1] += dt * ds[1];
    state[3] += dt * ds[3];
    state[5] += dt * ds[5];
    state[0] += dt * state[1];
    state[2] += dt * state[3];
    state[4] += dt * state[5];
  }
}

// ---------------------------------------------------------------------------
// 3D quadrotor: state [x, xd, y, yd, z, zd, phi, theta, psi, p, q, r],
// input per-motor [f1..f4];
// params: [mass, Ixx, Iyy, Izz, arm, kf, km, gravity]
// ---------------------------------------------------------------------------
static void quad3d_deriv(const double* s, const double* f, const double* pr,
                         double* ds) {
  const double m = pr[0], Ixx = pr[1], Iyy = pr[2], Izz = pr[3];
  const double L = pr[4], kf = pr[5], km = pr[6], g = pr[7];
  const double gamma = km / kf;
  const double phi = s[6], th = s[7], psi = s[8];
  const double p = s[9], q = s[10], r = s[11];
  const double cphi = std::cos(phi), sphi = std::sin(phi);
  const double cth = std::cos(th), sth = std::sin(th);
  const double cpsi = std::cos(psi), spsi = std::sin(psi);
  // R = Rz(psi) Ry(th) Rx(phi); body z column:
  const double Rz_x = cpsi * sth * cphi + spsi * sphi;
  const double Rz_y = spsi * sth * cphi - cpsi * sphi;
  const double Rz_z = cth * cphi;
  const double T = f[0] + f[1] + f[2] + f[3];
  ds[0] = s[1];
  ds[1] = Rz_x * T / m;
  ds[2] = s[3];
  ds[3] = Rz_y * T / m;
  ds[4] = s[5];
  ds[5] = Rz_z * T / m - g;
  const double l2 = L / std::sqrt(2.0);
  const double Mx = l2 * (f[0] + f[1] - f[2] - f[3]);
  const double My = l2 * (-f[0] + f[1] + f[2] - f[3]);
  const double Mz = gamma * (-f[0] + f[1] - f[2] + f[3]);
  // omega x (J omega)
  const double Jp = Ixx * p, Jq = Iyy * q, Jr = Izz * r;
  const double cx = q * Jr - r * Jq;
  const double cy = r * Jp - p * Jr;
  const double cz = p * Jq - q * Jp;
  ds[9] = (Mx - cx) / Ixx;
  ds[10] = (My - cy) / Iyy;
  ds[11] = (Mz - cz) / Izz;
  const double tth = std::tan(th);
  ds[6] = p + sphi * tth * q + cphi * tth * r;
  ds[7] = cphi * q - sphi * r;
  ds[8] = sphi / cth * q + cphi / cth * r;
}

void quad3d_advance(double* state, const double* f, const double* params,
                    double dt, int n_substeps) {
  double ds[12];
  for (int k = 0; k < n_substeps; ++k) {
    quad3d_deriv(state, f, params, ds);
    // velocities / body rates first
    state[1] += dt * ds[1];
    state[3] += dt * ds[3];
    state[5] += dt * ds[5];
    state[9] += dt * ds[9];
    state[10] += dt * ds[10];
    state[11] += dt * ds[11];
    // positions from new velocities, Euler angles from new body rates
    double mid[12];
    std::memcpy(mid, state, sizeof mid);
    double ds2[12];
    quad3d_deriv(mid, f, params, ds2);
    state[0] += dt * state[1];
    state[2] += dt * state[3];
    state[4] += dt * state[5];
    state[6] += dt * ds2[6];
    state[7] += dt * ds2[7];
    state[8] += dt * ds2[8];
  }
}

}  // extern "C"
