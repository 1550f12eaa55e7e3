// Single-period demand-driven hydraulic solver — C++ component.
//
// Native equivalent of the EPANET C library the reference drives through
// ctypes (reference: epynet's EN_runH at Executorv7.py:325-347, EN_set*
// wrappers at epynet_utils.py:94-254). Implements the Global Gradient
// Algorithm exactly as gnn_pressure_estimation_tpu/simgen/solver_py.py (the
// NumPy oracle); both operate in EPANET internal units (feet, cfs) with
// EPANET's constants (4.727 Hazen-Williams, 0.02517 minor loss, 2g = 64.4).
//
// The linear system (SPD junction-head matrix) is solved with Jacobi-
// preconditioned conjugate gradient over a CSR assembly; networks of
// O(10^2..10^5) nodes converge in far fewer iterations than a solve costs
// in Python. The scenario-generation hot loop calls hyd_solve once per
// scenario from a host process pool.
//
// Build: make -C gnn_pressure_estimation_tpu/simgen/solver  (produces
// libhydraulic.so; the Python binding is simgen/solver_cpp.py via ctypes).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double CBIG = 1e8;
constexpr double CSMALL = 1e-6;
constexpr double RQTOL = 1e-7;
constexpr double QTOL = 1e-4;
constexpr double HTOL = 5e-4;
constexpr double TINY_Q = 1e-6;
constexpr double HW_EXP = 1.852;
constexpr double GRAV2 = 64.4;
constexpr double PI = 3.14159265358979323846;

enum Status { ST_CLOSED = 0, ST_OPEN = 1, ST_ACTIVE = 2 };
enum LinkType { LT_PIPE = 0, LT_PUMP = 1, LT_VALVE = 2 };
enum ValveType { V_PRV = 0, V_PSV = 1, V_PBV = 2, V_FCV = 3, V_TCV = 4, V_GPV = 5 };

struct Net {
  int n_nodes, n_junctions, n_links;
  const int *link_type, *node1, *node2, *valve_type;
  const uint8_t* check_valve;
  const double *elevation, *fixed_head, *demand;
  const double *length, *diameter, *roughness, *minor_loss;
  const double *pump_h0, *pump_r, *pump_n, *pump_speed, *pump_power;
  const double* valve_setting;
  int headloss_model;
  double viscosity;
};

inline double sgn(double x) { return x >= 0 ? 1.0 : -1.0; }

// Jacobi-preconditioned CG for the SPD junction system in CSR-ish COO form.
// Returns false if it fails to reduce the residual.
bool cg_solve(int n, const std::vector<double>& diag,
              const std::vector<int>& off_i, const std::vector<int>& off_j,
              const std::vector<double>& off_v, const std::vector<double>& b,
              std::vector<double>& x) {
  std::vector<double> r(n), z(n), p(n), Ap(n);
  auto matvec = [&](const std::vector<double>& v, std::vector<double>& out) {
    for (int i = 0; i < n; ++i) out[i] = diag[i] * v[i];
    for (size_t k = 0; k < off_i.size(); ++k) out[off_i[k]] += off_v[k] * v[off_j[k]];
  };
  matvec(x, Ap);
  double bnorm = 0;
  for (int i = 0; i < n; ++i) {
    r[i] = b[i] - Ap[i];
    bnorm += b[i] * b[i];
  }
  bnorm = std::sqrt(bnorm);
  if (bnorm < 1e-30) { std::fill(x.begin(), x.end(), 0.0); return true; }
  double rz = 0;
  for (int i = 0; i < n; ++i) {
    z[i] = r[i] / diag[i];
    p[i] = z[i];
    rz += r[i] * z[i];
  }
  const double tol = 1e-12 * bnorm;
  int max_it = std::max(200, 4 * n);
  for (int it = 0; it < max_it; ++it) {
    double rn = 0;
    for (int i = 0; i < n; ++i) rn += r[i] * r[i];
    if (std::sqrt(rn) < tol) return true;
    matvec(p, Ap);
    double pAp = 0;
    for (int i = 0; i < n; ++i) pAp += p[i] * Ap[i];
    if (pAp <= 0 || !std::isfinite(pAp)) return false;
    double alpha = rz / pAp;
    for (int i = 0; i < n; ++i) {
      x[i] += alpha * p[i];
      r[i] -= alpha * Ap[i];
    }
    double rz_new = 0;
    for (int i = 0; i < n; ++i) {
      z[i] = r[i] / diag[i];
      rz_new += r[i] * z[i];
    }
    double beta = rz_new / rz;
    rz = rz_new;
    for (int i = 0; i < n; ++i) p[i] = z[i] + beta * p[i];
  }
  double rn = 0;
  for (int i = 0; i < n; ++i) rn += r[i] * r[i];
  return std::sqrt(rn) < 1e-6 * bnorm;  // loose acceptance
}

double dw_friction(double e, double d, double q, double visc) {
  double Re = std::max(4.0 * std::fabs(q) / (PI * d * visc), 1.0);
  if (Re < 2000.0) return 64.0 / Re;
  double arg4 = e / (3.7 * d) + 5.74 / std::pow(4000.0, 0.9);
  double f_hi = 0.25 / std::pow(std::log10(arg4), 2);
  if (Re > 4000.0) {
    double arg = e / (3.7 * d) + 5.74 / std::pow(Re, 0.9);
    return 0.25 / std::pow(std::log10(arg), 2);
  }
  double x = (Re - 2000.0) / 2000.0;
  double blend = x * x * (3.0 - 2.0 * x);
  double f_lo = 64.0 / 2000.0;
  return f_lo + blend * (f_hi - f_lo);
}

}  // namespace

extern "C" {

// Returns warn code: 0 ok, 1 unbalanced, 110 linear-solve failure.
// Outputs: head [n_nodes] ft, flow [n_links] cfs, status_out [n_links].
int hyd_solve(
    int n_nodes, int n_junctions, int n_links,
    const double* elevation, const double* fixed_head, const double* demand,
    const int* link_type, const int* node1, const int* node2,
    const int* status_in, const uint8_t* check_valve,
    const double* length, const double* diameter, const double* roughness,
    const double* minor_loss,
    const double* pump_h0, const double* pump_r, const double* pump_n,
    const double* pump_speed, const double* pump_power,
    const int* valve_type, const double* valve_setting,
    int headloss_model, double viscosity,
    int max_iter, double accuracy,
    double* head, double* flow, int* status_out, int* iters_out) {
  const int n = n_nodes, nj = n_junctions, L = n_links;

  std::vector<int> status(status_in, status_in + L);
  std::vector<double> q(L), area(L), r_pipe(L, 0.0), m_minor(L, 0.0);

  for (int k = 0; k < L; ++k) {
    double d = std::max(diameter[k], 1e-6);
    area[k] = PI * d * d / 4.0;
    m_minor[k] = 0.02517 * minor_loss[k] / (d * d * d * d);
    if (link_type[k] == LT_PIPE) {
      double Ld = length[k], c = std::max(roughness[k], 1e-6);
      if (headloss_model == 0) {
        r_pipe[k] = 4.727 * Ld / std::pow(c, HW_EXP) / std::pow(d, 4.871);
      } else if (headloss_model == 2) {
        double Rh = d / 4.0;
        r_pipe[k] = Ld * std::pow(c / 1.49, 2) / (area[k] * area[k] * std::pow(Rh, 4.0 / 3.0));
      } else {
        r_pipe[k] = Ld / (GRAV2 * d * area[k] * area[k]);
      }
    }
    // initial flow: 1 fps; pumps start near curve reference flow
    if (link_type[k] == LT_PUMP) {
      if (pump_r[k] > 0 && pump_h0[k] > 0) {
        q[k] = std::max(std::pow(pump_h0[k] / (4.0 * pump_r[k]), 1.0 / pump_n[k]), TINY_Q);
      } else {
        q[k] = std::max(area[k], TINY_Q);
      }
    } else {
      q[k] = std::max(PI * std::max(diameter[k], 1e-3) * std::max(diameter[k], 1e-3) / 4.0, TINY_Q);
    }
    // valves with unset settings behave as open
    if (link_type[k] == LT_VALVE && status[k] == ST_ACTIVE &&
        (valve_type[k] == V_PRV || valve_type[k] == V_PSV ||
         valve_type[k] == V_PBV || valve_type[k] == V_FCV) &&
        valve_setting[k] <= 0.0) {
      status[k] = ST_OPEN;
    }
  }

  std::vector<double> H(fixed_head, fixed_head + n);
  for (int i = 0; i < nj; ++i) H[i] = elevation[i] + 30.0;

  std::vector<double> p(L), y(L), X(n);
  double relerr = 1e30;
  bool status_changed = true;
  int it = 1;

  for (it = 1; it <= max_iter; ++it) {
    std::fill(X.begin(), X.end(), 0.0);
    for (int k = 0; k < L; ++k) {
      X[node2[k]] += q[k];
      X[node1[k]] -= q[k];
    }
    for (int i = 0; i < n; ++i) X[i] -= demand[i];

    std::vector<std::pair<int, double>> prv_rows;

    for (int k = 0; k < L; ++k) {
      double qa = std::max(std::fabs(q[k]), TINY_Q);
      switch (link_type[k]) {
        case LT_PIPE: {
          if (status[k] == ST_CLOSED) { p[k] = 1.0 / CBIG; y[k] = q[k]; break; }
          double hl, grad, r = r_pipe[k];
          if (headloss_model == 0) {
            hl = r * std::pow(qa, HW_EXP);
            grad = HW_EXP * r * std::pow(qa, HW_EXP - 1.0);
          } else {
            if (headloss_model == 1) r *= dw_friction(roughness[k], std::max(diameter[k], 1e-6), q[k], viscosity);
            hl = r * qa * qa;
            grad = 2.0 * r * qa;
          }
          hl += m_minor[k] * qa * qa;
          grad += 2.0 * m_minor[k] * qa;
          grad = std::max(grad, RQTOL);
          p[k] = 1.0 / grad;
          y[k] = hl * sgn(q[k]) / grad;
          break;
        }
        case LT_PUMP: {
          double w = pump_speed[k];
          if (status[k] == ST_CLOSED || w <= TINY_Q) { p[k] = 1.0 / CBIG; y[k] = q[k]; break; }
          double qq = std::max(q[k], TINY_Q), hgain, grad;
          if (pump_power[k] > 0) {
            hgain = 8.814 * pump_power[k] / qq;
            grad = std::min(8.814 * pump_power[k] / (qq * qq), CBIG);
          } else {
            double h0 = pump_h0[k] * w * w;
            double nn = pump_n[k];
            double rr = pump_r[k] * std::pow(w, 2.0 - nn);
            hgain = h0 - rr * std::pow(qq, nn);
            grad = std::max(nn * rr * std::pow(qq, nn - 1.0), RQTOL);
          }
          p[k] = 1.0 / grad;
          y[k] = -hgain / grad;
          break;
        }
        case LT_VALVE: {
          int vt = valve_type[k];
          int st = status[k];
          if (st == ST_CLOSED) { p[k] = 1.0 / CBIG; y[k] = q[k]; break; }
          if (st == ST_ACTIVE && vt == V_PRV) {
            p[k] = 0.0;
            y[k] = X[node2[k]];
            prv_rows.emplace_back(node2[k], elevation[node2[k]] + valve_setting[k]);
            break;
          }
          if (st == ST_ACTIVE && vt == V_PSV) {
            p[k] = 0.0;
            y[k] = -X[node1[k]];
            prv_rows.emplace_back(node1[k], elevation[node1[k]] + valve_setting[k]);
            break;
          }
          if (st == ST_ACTIVE && vt == V_PBV) { p[k] = CBIG; y[k] = CBIG * valve_setting[k]; break; }
          if (st == ST_ACTIVE && vt == V_FCV) {
            // EPANET fcvcoeff: fixed-flow injection through a tiny
            // conductance (q_new = setting + dh/CBIG) so junction
            // continuity stays exact even for an infeasible setting
            p[k] = 1.0 / CBIG;
            y[k] = q[k] - valve_setting[k];
            break;
          }
          double K = (vt == V_TCV && st == ST_ACTIVE) ? valve_setting[k] : minor_loss[k];
          double m = 0.02517 * K / std::pow(std::max(diameter[k], 1e-6), 4);
          double grad = std::max(2.0 * m * qa, CSMALL);
          p[k] = 1.0 / grad;
          y[k] = m * qa * qa * sgn(q[k]) / grad;
          break;
        }
      }
    }

    // assemble junction system
    std::vector<double> diag(nj, 1e-12), F(nj);
    std::vector<int> off_i, off_j;
    std::vector<double> off_v;
    off_i.reserve(2 * L); off_j.reserve(2 * L); off_v.reserve(2 * L);

    for (int i = 0; i < nj; ++i) F[i] = -demand[i];
    for (int k = 0; k < L; ++k) {
      double qy = q[k] - y[k];
      int a = node1[k], b = node2[k];
      if (b < nj) F[b] += qy;
      if (a < nj) F[a] -= qy;
      double pl = p[k];
      if (pl == 0.0) continue;
      bool ja = a < nj, jb = b < nj;
      if (ja) {
        diag[a] += pl;
        if (jb) { off_i.push_back(a); off_j.push_back(b); off_v.push_back(-pl); }
        else F[a] += pl * H[b];
      }
      if (jb) {
        diag[b] += pl;
        if (ja) { off_i.push_back(b); off_j.push_back(a); off_v.push_back(-pl); }
        else F[b] += pl * H[a];
      }
    }
    for (auto& pr : prv_rows) {
      if (pr.first < nj) { diag[pr.first] += CBIG; F[pr.first] += CBIG * pr.second; }
    }

    std::vector<double> Hj(H.begin(), H.begin() + nj);
    if (!cg_solve(nj, diag, off_i, off_j, off_v, F, Hj)) {
      for (int i = 0; i < n; ++i) head[i] = H[i];
      for (int k = 0; k < L; ++k) { flow[k] = q[k]; status_out[k] = status[k]; }
      *iters_out = it;
      return 110;
    }
    bool finite = true;
    for (int i = 0; i < nj; ++i) finite = finite && std::isfinite(Hj[i]);
    if (!finite) {
      for (int i = 0; i < n; ++i) head[i] = H[i];
      for (int k = 0; k < L; ++k) { flow[k] = q[k]; status_out[k] = status[k]; }
      *iters_out = it;
      return 110;
    }
    for (int i = 0; i < nj; ++i) H[i] = Hj[i];

    // flow update
    double sum_dq = 0, sum_q = 0;
    for (int k = 0; k < L; ++k) {
      double dh = H[node1[k]] - H[node2[k]];
      double qn = (q[k] - y[k]) + p[k] * dh;
      sum_dq += std::fabs(qn - q[k]);
      sum_q += std::fabs(qn);
      q[k] = qn;
    }
    relerr = sum_dq / std::max(sum_q, TINY_Q);

    // status checks — EPANET schedule: pumps/CVs every CheckFreq=2 while
    // it<=MaxCheck=10, PRV/PSV every iteration while it<=MaxCheck; after
    // that only at flow convergence (prevents parallel-pump flip-flop).
    const int MAXCHECK = 10, CHECKFREQ = 2;
    bool flow_conv = relerr < accuracy;
    bool check_links = (it <= MAXCHECK && it % CHECKFREQ == 0) || flow_conv;
    bool check_valves = (it <= MAXCHECK) || flow_conv;
    status_changed = false;
    for (int k = 0; k < L; ++k) {
      double dh = H[node1[k]] - H[node2[k]];
      if (!check_links && (link_type[k] == LT_PIPE || link_type[k] == LT_PUMP)) continue;
      if (!check_valves && link_type[k] == LT_VALVE) continue;
      if (link_type[k] == LT_PIPE && check_valve[k]) {
        if (status[k] == ST_OPEN && (dh < -HTOL || q[k] < -QTOL)) {
          status[k] = ST_CLOSED; q[k] = TINY_Q; status_changed = true;
        } else if (status[k] == ST_CLOSED && dh > HTOL) {
          status[k] = ST_OPEN; q[k] = TINY_Q; status_changed = true;
        }
      } else if (link_type[k] == LT_PUMP && status_in[k] != ST_CLOSED) {
        double w = pump_speed[k];
        double hmax = (pump_power[k] == 0) ? pump_h0[k] * w * w : CBIG;
        if (status[k] == ST_OPEN && -dh > hmax + HTOL) {
          status[k] = ST_CLOSED; q[k] = TINY_Q; status_changed = true;
        } else if (status[k] == ST_CLOSED && -dh < hmax - HTOL) {
          status[k] = ST_OPEN; q[k] = TINY_Q; status_changed = true;
        }
      } else if (link_type[k] == LT_VALVE && status_in[k] != ST_CLOSED) {
        int vt = valve_type[k];
        double h1 = H[node1[k]], h2 = H[node2[k]];
        int st = status[k], nw = st;
        if (vt == V_PRV && valve_setting[k] > 0) {
          double hset = elevation[node2[k]] + valve_setting[k];
          if (st == ST_ACTIVE) {
            if (q[k] < -QTOL) nw = ST_CLOSED;
            else if (h1 < hset - HTOL) nw = ST_OPEN;
          } else if (st == ST_OPEN) {
            if (q[k] < -QTOL) nw = ST_CLOSED;
            else if (h2 >= hset + HTOL) nw = ST_ACTIVE;
          } else {
            if (h1 >= hset + HTOL && h2 < hset - HTOL) nw = ST_ACTIVE;
            else if (h1 < hset - HTOL && h1 > h2 + HTOL) nw = ST_OPEN;
          }
        } else if (vt == V_PSV && valve_setting[k] > 0) {
          double hset = elevation[node1[k]] + valve_setting[k];
          if (st == ST_ACTIVE) {
            if (q[k] < -QTOL) nw = ST_CLOSED;
            else if (h2 > hset + HTOL) nw = ST_OPEN;
          } else if (st == ST_OPEN) {
            if (q[k] < -QTOL) nw = ST_CLOSED;
            else if (h1 <= hset - HTOL) nw = ST_ACTIVE;
          } else {
            if (h2 <= hset - HTOL && h1 > hset + HTOL) nw = ST_ACTIVE;
            else if (h2 > hset + HTOL && h1 > h2 + HTOL) nw = ST_OPEN;
          }
        } else if (vt == V_FCV && st == ST_ACTIVE) {
          if (h1 < h2 - HTOL) nw = ST_OPEN;
        }
        if (nw != st) { status[k] = nw; q[k] = TINY_Q; status_changed = true; }
      }
    }

    if (relerr < accuracy && !status_changed && it > 1) break;
  }

  for (int i = 0; i < n; ++i) head[i] = H[i];
  for (int k = 0; k < L; ++k) { flow[k] = q[k]; status_out[k] = status[k]; }
  *iters_out = std::min(it, max_iter);
  return (relerr < accuracy) ? 0 : 1;
}

// Batched entry: solves n_scen scenarios that share topology but differ in
// node/link parameters (demands, elevations, roughness, settings...). The
// scenario executor uses this to amortize call overhead across a batch.
int hyd_solve_batch(
    int n_scen,
    int n_nodes, int n_junctions, int n_links,
    const double* elevation, const double* fixed_head, const double* demand,
    const int* link_type, const int* node1, const int* node2,
    const int* status_in, const uint8_t* check_valve,
    const double* length, const double* diameter, const double* roughness,
    const double* minor_loss,
    const double* pump_h0, const double* pump_r, const double* pump_n,
    const double* pump_speed, const double* pump_power,
    const int* valve_type, const double* valve_setting,
    int headloss_model, double viscosity,
    int max_iter, double accuracy,
    double* head, double* flow, int* status_out, int* iters_out,
    int* warn_out) {
  for (int s = 0; s < n_scen; ++s) {
    warn_out[s] = hyd_solve(
        n_nodes, n_junctions, n_links,
        elevation + (size_t)s * n_nodes, fixed_head + (size_t)s * n_nodes,
        demand + (size_t)s * n_nodes,
        link_type, node1, node2,
        status_in + (size_t)s * n_links, check_valve,
        length + (size_t)s * n_links, diameter + (size_t)s * n_links,
        roughness + (size_t)s * n_links, minor_loss + (size_t)s * n_links,
        pump_h0 + (size_t)s * n_links, pump_r + (size_t)s * n_links,
        pump_n + (size_t)s * n_links, pump_speed + (size_t)s * n_links,
        pump_power + (size_t)s * n_links,
        valve_type, valve_setting + (size_t)s * n_links,
        headloss_model, viscosity, max_iter, accuracy,
        head + (size_t)s * n_nodes, flow + (size_t)s * n_links,
        status_out + (size_t)s * n_links, iters_out + s);
  }
  return 0;
}

}  // extern "C"
