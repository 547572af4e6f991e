// Wrapper main() for the reference Boussinesq stepper, which ships as a
// header-only gen-1 prototype without any driver (/root/reference/
// bouss_solver.hpp:3-81). Mirrors the kg_driver conventions
// (nlsolvers/host/drivers/kg_driver.cpp:105-121): u_past = u0 - dt*v0,
// snapshot 0 = IC, snapshot k = state after k*freq steps, velocity
// (u - u_past)/dt. No boundary call: the reference steppers apply none and
// their operators carry their own one-sided closures.
//
// bouss_solver.hpp has no include guards and re-includes the root
// eigen_krylov_real.hpp / laplacians.hpp itself, so this file includes only
// bouss_solver.hpp (resolved to the root gen-1 headers via -I order) plus
// the gen-3 util.hpp for npy I/O.
#include "bouss_solver.hpp"
// gen-3 util by explicit path: the root util.hpp points at the empty libnpy
// submodule, and "-I/root/reference" must stay first for bouss_solver.hpp
#include "/root/reference/nlsolvers/common/include/util.hpp"

#include <iostream>
#include <string>
#include <vector>

int main(int argc, char **argv) {
  if (argc != 13) {
    std::cerr << "Usage: " << argv[0]
              << " nx ny Lx Ly u0.npy v0.npy traj.npy vel.npy T nt "
                 "num_snapshots mode(gautschi|stiff)\n";
    return 1;
  }
  const uint32_t nx = std::stoul(argv[1]);
  const uint32_t ny = std::stoul(argv[2]);
  const double Lx = std::stod(argv[3]);
  const double Ly = std::stod(argv[4]);
  const std::string u0_file = argv[5], v0_file = argv[6];
  const std::string traj_file = argv[7], vel_file = argv[8];
  const double T = std::stod(argv[9]);
  const uint32_t nt = std::stoul(argv[10]);
  const uint32_t num_snapshots = std::stoul(argv[11]);
  const std::string mode = argv[12];

  const double dx = 2 * Lx / (nx - 1);
  const double dy = 2 * Ly / (ny - 1);
  const double dt = T / nt;
  const uint32_t freq = nt / num_snapshots;

  std::vector<uint32_t> shape_in;
  Eigen::VectorXd u0 = read_from_npy<double>(u0_file, shape_in);
  Eigen::VectorXd v0 = read_from_npy<double>(v0_file, shape_in);

  const Eigen::SparseMatrix<double> lap =
      build_laplacian_noflux<double>(nx - 2, ny - 2, dx, dy);
  const Eigen::SparseMatrix<double> l4 =
      build_xxxx_noflux<double>(nx - 2, ny - 2, dx);
  // Gautschi convention (bouss_solver.hpp:3-15): u_tt + L u = g(u) with
  // L = -Delta - d4/dx4; step_stiff's own comment integrates
  // u_{n+1} = 2u - u_past + dt^2((Delta + d4/dx4)u + 3(u^2)_xx).
  const Eigen::SparseMatrix<double> L =
      (mode == "stiff") ? Eigen::SparseMatrix<double>((lap + l4).eval())
                        : Eigen::SparseMatrix<double>(((-lap) - l4).eval());

  Eigen::VectorXd u = u0;
  Eigen::VectorXd u_past = u0 - dt * v0;
  Eigen::VectorXd buf(nx * ny);
  Eigen::VectorXd c = Eigen::VectorXd::Ones(nx * ny);  // unused by steppers
  Eigen::VectorXd m = Eigen::VectorXd::Ones(nx * ny);

  Eigen::VectorXd u_save(num_snapshots * nx * ny);
  Eigen::VectorXd v_save(num_snapshots * nx * ny);
  Eigen::Map<Eigen::Matrix<double, -1, -1, Eigen::RowMajor>> u_mat(
      u_save.data(), num_snapshots, nx * ny);
  Eigen::Map<Eigen::Matrix<double, -1, -1, Eigen::RowMajor>> v_mat(
      v_save.data(), num_snapshots, nx * ny);
  u_mat.row(0) = u0.transpose();
  v_mat.row(0) = v0.transpose();

  for (uint32_t i = 1; i < nt; ++i) {
    if (mode == "stiff")
      BSolver::step_stiff<double>(u, u_past, buf, L, c, m, dt, nx, ny, dx);
    else
      BSolver::step<double>(u, u_past, buf, L, c, m, dt, nx, ny, dx);
    if (i % freq == 0) {
      const uint32_t k = i / freq;
      if (k < num_snapshots) {
        u_mat.row(k) = u.transpose();
        v_mat.row(k) = ((u - u_past) / dt).transpose();
      }
    }
  }
  const std::vector<uint32_t> shape = {num_snapshots, ny, nx};
  save_to_npy(traj_file, u_save, shape);
  save_to_npy(vel_file, v_save, shape);
  return 0;
}
