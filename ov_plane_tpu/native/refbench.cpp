// Reference-workload CPU microbench: the per-frame linear-algebra workload of
// rpng/ov_plane's simulated-VIO loop, implemented fresh in Eigen (double,
// single-thread, -O3) at the exact sizes of this repo's bench.py config.
//
// Purpose (BASELINE.md "grounding the denominator"): the reference binary
// cannot be built here (ROS + Ceres absent), so this measures an UPPER BOUND
// on the reference's CPU throughput for the same filter workload on the same
// host — it performs only the hot linear algebra of the reference's frame
// loop and none of its bookkeeping (FeatureDatabase maps, per-feature heap
// churn, chi2 table lookups, ROS plumbing). Any real ov_plane run on this
// host is strictly slower than this number.
//
// Workload mirrored (structure, not code, from the reference):
//  - Propagator::propagate_and_clone  (Propagator.cpp): per-IMU-sample 15x15
//    Phi/Qd mean+cov propagation with the 15xD cross-covariance update, then
//    StateHelper::augment_clone's covariance grow-by-6.
//  - UpdaterMSCKF::update (UpdaterMSCKF.cpp:90-272): per-feature Gauss-Newton
//    triangulation refine, per-feature [2m x D] Jacobian assembly, Givens
//    nullspace projection of the 3 feature columns, global stack, Householder
//    measurement compression to <=D rows, chi2 gate, and the EKF update
//    K = P H^T S^-1 via LLT with the Joseph-less covariance downdate the
//    reference uses (StateHelper::EKFUpdate).
//  - StateHelper::marginalize oldest clone: covariance block shift-down.
//
// Build+run: see scripts/ground_baseline.py. Prints per-stage ms/frame + fps.
#include <Eigen/Dense>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <map>
#include <memory>
#include <random>
#include <vector>

using Eigen::MatrixXd;
using Eigen::VectorXd;
using Eigen::Vector3d;

// FeatureDatabase-style bookkeeping (ov_core FeatureDatabase: a std::map of
// shared_ptr<Feature>, each holding per-camera timestamp/uv vectors; every
// frame does update_feature lookups/inserts for each observation, and the
// manager walks the map for lost/marginal feature selection + cleanup).
struct Feature {
  size_t id;
  std::vector<double> ts;
  std::vector<Eigen::Vector2f> uvs, uvs_norm;
  bool to_delete = false;
};

int main(int argc, char** argv) {
  // bench.py sim-mode sizes: D = 15 imu + 12 clones x 6 + 3 slam + 3 plane.
  int n_clones = argc > 1 ? atoi(argv[1]) : 12;
  int n_feat   = argc > 2 ? atoi(argv[2]) : 40;   // tpu.max_msckf_update
  int m_obs    = argc > 3 ? atoi(argv[3]) : 8;    // obs per MSCKF feature
  int n_imu    = argc > 4 ? atoi(argv[4]) : 25;   // IMU samples per frame
  int n_frames = argc > 5 ? atoi(argv[5]) : 300;  // 30 s at 10 Hz cam
  int n_obs_frame = argc > 6 ? atoi(argv[6]) : 0; // 0 = skip bookkeeping mode
  const int D = 15 + 6 * n_clones + 6;

  std::mt19937 gen(42);
  std::normal_distribution<double> nd(0.0, 1.0);
  auto randn = [&](int r, int c) {
    MatrixXd M(r, c);
    for (int i = 0; i < r * c; i++) M.data()[i] = nd(gen);
    return M;
  };

  // State covariance (PSD, well-conditioned like a converged filter).
  MatrixXd A0 = randn(D, D);
  MatrixXd P = 1e-4 * (A0 * A0.transpose()) + 1e-3 * MatrixXd::Identity(D, D);
  VectorXd x = VectorXd::Zero(D);

  std::map<size_t, std::shared_ptr<Feature>> feat_db;
  size_t next_fid = 0;
  std::mt19937 fgen(7);

  double t_prop = 0, t_tri = 0, t_jac = 0, t_null = 0, t_comp = 0, t_upd = 0,
         t_marg = 0, t_db = 0;
  using clk = std::chrono::steady_clock;
  auto ms = [](clk::time_point a, clk::time_point b) {
    return std::chrono::duration<double, std::milli>(b - a).count();
  };

  auto wall0 = clk::now();
  for (int f = 0; f < n_frames; f++) {
    // --- propagation (Propagator::propagate_and_clone): per-sample the
    // reference integrates the mean (RK4) and COMPOUNDS Phi/Qd at 15x15;
    // the D-wide covariance propagation (StateHelper::EKFPropagation) runs
    // ONCE per frame with the compounded transition. ------------------------
    auto t0 = clk::now();
    MatrixXd PhiS = MatrixXd::Identity(15, 15);
    MatrixXd QdS = MatrixXd::Zero(15, 15);
    for (int k = 0; k < n_imu; k++) {
      // Phi assembled per sample from the current linearization (the
      // reference recomputes it each step; we use a perturbed structured Phi).
      MatrixXd Phi = MatrixXd::Identity(15, 15);
      Phi.block<3, 3>(0, 9)  = -0.0025 * MatrixXd::Identity(3, 3);
      Phi.block<3, 3>(6, 0)  = 0.0025 * randn(3, 3);
      Phi.block<3, 3>(3, 6)  = 0.0025 * MatrixXd::Identity(3, 3);
      Phi.block<3, 3>(6, 12) = -0.0025 * randn(3, 3);
      MatrixXd Qd = 1e-8 * MatrixXd::Identity(15, 15);
      // RK4 mean integration stand-in: 4 slope evaluations on the 16-dim
      // mean (quat/pos/vel/biases) — a handful of 3-vector ops per stage,
      // negligible next to the matrix work but kept for structure.
      Vector3d w(0.1 * nd(gen), 0.1 * nd(gen), 0.1 * nd(gen));
      Vector3d a(0.1 * nd(gen), 0.1 * nd(gen), 9.81);
      Vector3d v = x.segment<3>(6) + 0.0025 * a;
      x.segment<3>(3) += 0.0025 * v + w.cross(a) * 0.0;
      PhiS = Phi * PhiS;
      QdS = Phi * QdS * Phi.transpose() + Qd;
    }
    P.topLeftCorner(15, 15) = PhiS * P.topLeftCorner(15, 15) * PhiS.transpose() + QdS;
    P.topRightCorner(15, D - 15) = PhiS * P.topRightCorner(15, D - 15);
    P.bottomLeftCorner(D - 15, 15) = P.topRightCorner(15, D - 15).transpose();
    auto t1 = clk::now();
    t_prop += ms(t0, t1);

    // --- clone augment: rows 15..21 get the IMU pose block ------------------
    // (StateHelper::augment_clone; clone slots are recycled in steady state,
    // so this is a block copy, not a resize.)
    {
      MatrixXd J = MatrixXd::Zero(6, D);
      J.block<3, 3>(0, 0) = MatrixXd::Identity(3, 3);
      J.block<3, 3>(3, 3) = MatrixXd::Identity(3, 3);
      MatrixXd PJt = P * J.transpose();            // D x 6
      int c0 = 15 + 6 * ((f) % n_clones);
      P.block(c0, 0, 6, D) = PJt.transpose();
      P.block(0, c0, D, 6) = PJt;
      P.block(c0, c0, 6, 6) = J * PJt;
    }

    // --- MSCKF features ------------------------------------------------------
    int rows_per = 2 * m_obs - 3;                  // after nullspace
    MatrixXd Hbig = MatrixXd::Zero(n_feat * rows_per, D);
    VectorXd rbig = VectorXd::Zero(n_feat * rows_per);
    int rows = 0;
    for (int i = 0; i < n_feat; i++) {
      // Triangulation refine: 5 GN iterations over m obs of the inverse-depth
      // scalar system (FeatureInitializer::single_gaussnewton's inner loop).
      auto ta = clk::now();
      Vector3d p_f = Vector3d(1.0, 0.5, 3.0) + 0.01 * Vector3d(nd(gen), nd(gen), nd(gen));
      for (int it = 0; it < 5; it++) {
        Eigen::Matrix3d Atri = Eigen::Matrix3d::Zero();
        Vector3d btri = Vector3d::Zero();
        for (int o = 0; o < m_obs; o++) {
          Vector3d bvec(0.1 * nd(gen), 0.1 * nd(gen), 1.0);
          bvec.normalize();
          Eigen::Matrix3d N = Eigen::Matrix3d::Identity() - bvec * bvec.transpose();
          Atri += N;
          btri += N * Vector3d(0.1 * o, 0.0, 0.1);
        }
        p_f = Atri.ldlt().solve(btri);
      }
      auto tb = clk::now();
      t_tri += ms(ta, tb);

      // Per-feature Jacobians over the COMPACT involved-column set (the
      // reference's UpdaterHelper builds H_x only over the feature's clone
      // blocks and scatters at stack time): [2m x 6m] H_x + [2m x 3] H_f.
      MatrixXd Hx = MatrixXd::Zero(2 * m_obs, 6 * m_obs);
      MatrixXd Hf = randn(2 * m_obs, 3);
      VectorXd res = 0.01 * randn(2 * m_obs, 1);
      for (int o = 0; o < m_obs; o++) {
        Hx.block(2 * o, 6 * o, 2, 6) = randn(2, 6);
      }
      auto tc = clk::now();
      t_jac += ms(tb, tc);

      // Givens nullspace projection of the 3 feature columns on the compact
      // block (UpdaterHelper::nullspace_project_inplace).
      Eigen::JacobiRotation<double> G;
      for (int n = 0; n < 3; n++) {
        for (int r = (int)Hf.rows() - 1; r > n; r--) {
          G.makeGivens(Hf(r - 1, n), Hf(r, n));
          Hf.applyOnTheLeft(r, r - 1, G.adjoint());
          Hx.applyOnTheLeft(r, r - 1, G.adjoint());
          res.applyOnTheLeft(r, r - 1, G.adjoint());
        }
      }
      // Scatter the projected compact rows into the big stacked system.
      for (int o = 0; o < m_obs; o++) {
        int c0 = 15 + 6 * ((f + o) % n_clones);
        Hbig.block(rows, c0, rows_per, 6) = Hx.block(3, 6 * o, rows_per, 6);
      }
      rbig.segment(rows, rows_per) = res.tail(rows_per);
      rows += rows_per;
      auto td = clk::now();
      t_null += ms(tc, td);
    }

    // --- measurement compression to <= D rows (UpdaterHelper::measurement_
    // compress_inplace: thin Householder QR on the stacked system) -----------
    auto te = clk::now();
    MatrixXd Hr = Hbig.topRows(rows);
    Eigen::HouseholderQR<MatrixXd> qr(Hr);
    MatrixXd Rfull = qr.matrixQR().triangularView<Eigen::Upper>();
    int r_eff = std::min(rows, D);
    MatrixXd Hc = Rfull.topRows(r_eff);
    VectorXd rc = (qr.householderQ().transpose() * rbig.head(rows)).head(r_eff);
    auto tf = clk::now();
    t_comp += ms(te, tf);

    // --- EKF update (StateHelper::EKFUpdate): S = H P H^T + R, K = P H^T S^-1,
    // P <- P - K H P ---------------------------------------------------------
    MatrixXd PHt = P * Hc.transpose();                       // D x r
    MatrixXd S = Hc * PHt + 1e-4 * MatrixXd::Identity(r_eff, r_eff);
    Eigen::LLT<MatrixXd> llt(S);
    MatrixXd K = llt.solve(PHt.transpose()).transpose();     // D x r
    x.noalias() += K * rc;
    P.noalias() -= K * PHt.transpose();
    P = 0.5 * (P + P.transpose());
    auto tg = clk::now();
    t_upd += ms(tf, tg);

    // --- marginalize oldest clone: block shift (StateHelper::marginalize) ---
    {
      int c0 = 15 + 6 * ((f + 1) % n_clones);
      MatrixXd Pn = P;
      Pn.block(c0, 0, 6, D).setZero();
      Pn.block(0, c0, D, 6).setZero();
      P = Pn;
    }
    auto th = clk::now();
    t_marg += ms(tg, th);

    // --- FeatureDatabase bookkeeping (n_obs_frame > 0): the reference's
    // per-frame feature management, modeled on ov_core FeatureDatabase +
    // VioManager::do_feature_propagate_update's selection walks ------------
    if (n_obs_frame > 0) {
      static std::vector<size_t> active;
      if ((int)active.size() < n_obs_frame)
        while ((int)active.size() < n_obs_frame) active.push_back(next_fid++);
      std::uniform_real_distribution<double> u01(0.0, 1.0);
      double tnow = 0.05 * f;
      // update_feature: map lookup/insert + per-obs vector pushes + undistort.
      for (size_t& fid : active) {
        if (u01(fgen) < 1.0 / m_obs) fid = next_fid++;   // track death/birth
        auto it = feat_db.find(fid);
        std::shared_ptr<Feature> ft;
        if (it == feat_db.end()) {
          ft = std::make_shared<Feature>();
          ft->id = fid;
          feat_db[fid] = ft;
        } else {
          ft = it->second;
        }
        float u = (float)u01(fgen) * 640.f, v = (float)u01(fgen) * 480.f;
        ft->ts.push_back(tnow);
        ft->uvs.emplace_back(u, v);
        // radtan undistort stand-in (fixed-point iterations the sim skips,
        // but the normalized push the reference always does).
        ft->uvs_norm.emplace_back((u - 320.f) / 300.f, (v - 240.f) / 300.f);
      }
      // Selection walks: lost features (no obs at tnow) + over-length ones.
      std::vector<std::shared_ptr<Feature>> lost, marg;
      for (auto& kv : feat_db) {
        auto& ft = kv.second;
        if (ft->ts.empty()) continue;
        if (ft->ts.back() < tnow - 1e-9) lost.push_back(ft);
        else if ((int)ft->ts.size() > n_clones) marg.push_back(ft);
        if ((int)lost.size() + (int)marg.size() > 2 * n_feat) break;
      }
      // Consume + cleanup (erase walk, shared_ptr churn).
      for (auto& ft : lost) ft->to_delete = true;
      for (auto& ft : marg) ft->to_delete = true;
      for (auto it2 = feat_db.begin(); it2 != feat_db.end();) {
        if (it2->second->to_delete) it2 = feat_db.erase(it2);
        else ++it2;
      }
      auto ti2 = clk::now();
      t_db += ms(th, ti2);
    }
  }
  double wall = ms(wall0, clk::now());

  double n = n_frames;
  printf("refbench: D=%d clones=%d feats=%d obs=%d imu/frame=%d frames=%d\n",
         D, n_clones, n_feat, m_obs, n_imu, n_frames);
  printf("per-frame ms: prop=%.3f tri=%.3f jac=%.3f null=%.3f comp=%.3f upd=%.3f marg=%.3f db=%.3f\n",
         t_prop / n, t_tri / n, t_jac / n, t_null / n, t_comp / n, t_upd / n,
         t_marg / n, t_db / n);
  printf("total %.1f ms for %d frames -> %.1f fps (single thread)\n", wall,
         n_frames, 1e3 * n_frames / wall);
  // Machine-readable line for scripts/ground_baseline.py.
  printf("JSON {\"fps\": %.2f, \"ms_per_frame\": %.4f}\n", 1e3 * n_frames / wall,
         wall / n_frames);
  return 0;
}
