// blk_2m rhs_columnwise oracle: one column per stdin block.
// argv: dt dz nz ; stdin: nz rows of "rhod rr nr dot_rr dot_nr"
// stdout: nz rows of "dot_rr dot_nr", then the surface flux.
#include <cassert>
#define CUDART_PI 3.141592653589793238462643383279502884
#define __NVCC__ 1
#include <cstdio>
#include <cmath>
#include <vector>
#include <algorithm>
using std::sqrt; using std::pow; using std::exp; using std::log;
using std::min; using std::max; using std::abs; using std::cbrt;
#include <libcloudph++/common/units.hpp>
namespace libcloudphxx { namespace common { namespace detail {
namespace fake_units {
namespace si { typedef detail::qntt_t frequency; }
template <typename q, typename real_t>
inline quantity<q, real_t>& operator+=(quantity<q, real_t> &a,
                                       const quantity<q, real_t> &b)
{ a.value += b.value; return a; }
namespace detail {
  inline quantity<qntt_t, double> operator*(const int &a, const unit_t &)
  { return quantity<qntt_t, double>(a); }
  template <typename real_t>
  inline quantity<qntt_t, real_t> operator*(const real_t &a, const qntt_t&)
  { return quantity<qntt_t, real_t>(a); }
}
}}}}
#include <libcloudph++/common/macros.hpp>
#include <libcloudph++/common/moist_air.hpp>
#include <libcloudph++/common/const_cp.hpp>
#include <libcloudph++/common/earth.hpp>
namespace libcloudphxx { namespace blk_2m { namespace formulae {
  using libcloudphxx::common::earth::rho_stp;
  using libcloudphxx::common::earth::g;
}}}
#include <libcloudph++/blk_2m/common_formulae.hpp>
#include <libcloudph++/blk_2m/terminal_vel_formulae.hpp>

using real_t = double;
using namespace libcloudphxx::blk_2m;
namespace fm = libcloudphxx::blk_2m::formulae;

int main(int argc, char** argv) {
  real_t dt, dz; int nz;
  sscanf(argv[1], "%lf", &dt); sscanf(argv[2], "%lf", &dz);
  sscanf(argv[3], "%d", &nz);
  std::vector<real_t> rhod(nz), rr(nz), nr(nz), dot_rr(nz), dot_nr(nz);
  for (int k = 0; k < nz; ++k)
    if (scanf("%lf %lf %lf %lf %lf", &rhod[k], &rr[k], &nr[k],
              &dot_rr[k], &dot_nr[k]) != 5) return 1;

  auto vm = [&](real_t rho, real_t r, real_t n) {
    return real_t(fm::v_term_m(rho * si::kilograms / si::cubic_metres,
      quantity<si::dimensionless, real_t>(r), n / si::kilograms));
  };
  auto vn = [&](real_t rho, real_t r, real_t n) {
    return real_t(fm::v_term_n(rho * si::kilograms / si::cubic_metres,
      quantity<si::dimensionless, real_t>(r), n / si::kilograms));
  };

  real_t flux_rr_in = 0, flux_nr_in = 0;
  // iterate top -> bottom (mirror of the reference's reverse loop)
  const real_t zero = 0;
  const real_t *rr_p = &zero, *nr_p = &zero, *rhod_p = &rhod[nz-1];
  real_t *dot_rr_p = NULL, *dot_nr_p = NULL;
  for (int k = nz - 1; k >= 0; --k) {
    const real_t *rhod_b = &rhod[k], *rr_b = &rr[k], *nr_b = &nr[k];
    if (dot_rr_p != NULL) {
      real_t mom_m = -0.5 * (*rhod_b * vm(*rhod_b, *rr_b, *nr_b)
                           + *rhod_p * vm(*rhod_p, *rr_p, *nr_p));
      real_t mom_n = -0.5 * (*rhod_b * vn(*rhod_b, *rr_b, *nr_b)
                           + *rhod_p * vn(*rhod_p, *rr_p, *nr_p));
      real_t fro = mom_m * (*rr_p) / dz;
      fro = -min(-fro, *rhod_p * (*rr_p + dt * *dot_rr_p) / dt);
      real_t fno = mom_n * (*nr_p) / dz;
      fno = -min(-fno, *rhod_p * (*nr_p + dt * *dot_nr_p) / dt);
      *dot_rr_p -= (flux_rr_in - fro) / *rhod_p;
      flux_rr_in = fro;
      *dot_nr_p -= (flux_nr_in - fno) / *rhod_p;
      flux_nr_in = fno;
    }
    dot_rr_p = &dot_rr[k]; dot_nr_p = &dot_nr[k];
    rhod_p = rhod_b; rr_p = rr_b; nr_p = nr_b;
  }
  // bottom cell: mid-cell vterm
  real_t mom_m = -(*rhod_p) * vm(*rhod_p, *rr_p, *nr_p);
  real_t mom_n = -(*rhod_p) * vn(*rhod_p, *rr_p, *nr_p);
  real_t fno = mom_n * (*nr_p) / dz;
  fno = -min(-fno, *rhod_p * (*nr_p + dt * *dot_nr_p) / dt);
  *dot_nr_p -= (flux_nr_in - fno) / *rhod_p;
  real_t fro = mom_m * (*rr_p) / dz;
  fro = -min(-fro, *rhod_p * (*rr_p + dt * *dot_rr_p) / dt);
  *dot_rr_p -= (flux_rr_in - fro) / *rhod_p;
  for (int k = 0; k < nz; ++k)
    printf("%.17g %.17g\n", dot_rr[k], dot_nr[k]);
  printf("%.17g\n", fro);  // surface rain flux (reference return value)
  return 0;
}
