// Single-cell blk_2m rhs_cellwise chain oracle, assembled from the
// reference's own formula headers (rhs_cellwise.hpp body transcribed
// without the zip iterator).  stdin rows: rhod th rv rc nc rr nr ; argv:
// dt.  stdout: dot_th dot_rv dot_rc dot_nc dot_rr dot_nr
#define __NVCC__ 1
#include <cstdio>
#include <cmath>
#include <algorithm>
#include <stdexcept>
using std::sqrt; using std::pow; using std::exp; using std::log;
using std::min; using std::max; using std::abs; using std::cbrt;
#include <cassert>
#define CUDART_PI 3.141592653589793238462643383279502884
#include <libcloudph++/common/units.hpp>
// fake_units' si lacks a few typedefs the blk_2m headers use
namespace libcloudphxx { namespace common { namespace detail {
namespace fake_units { namespace si {
  typedef detail::qntt_t frequency;
}
template <typename q, typename real_t>
inline quantity<q, real_t>& operator+=(quantity<q, real_t> &a,
                                       const quantity<q, real_t> &b)
{ a.value += b.value; return a; }
namespace detail {
  // `0 * si::metres` in return statements must yield a double quantity
  inline quantity<qntt_t, double> operator*(const int &a, const unit_t &)
  { return quantity<qntt_t, double>(a); }
  // real_t * si::dimensionless() etc. (tag-struct instances)
  template <typename real_t>
  inline quantity<qntt_t, real_t> operator*(const real_t &a, const qntt_t&)
  { return quantity<qntt_t, real_t>(a); }
  template <typename real_t>
  inline quantity<qntt_t, real_t> operator/(const real_t &a, const qntt_t&)
  { return quantity<qntt_t, real_t>(a); }
}
}}}}
#include <libcloudph++/common/macros.hpp>
#include <libcloudph++/common/moist_air.hpp>
#include <libcloudph++/common/const_cp.hpp>
#include <libcloudph++/common/theta_dry.hpp>
#include <libcloudph++/common/theta_std.hpp>
#include <libcloudph++/blk_2m/common_formulae.hpp>
#include <libcloudph++/blk_2m/activation_formulae.hpp>
#include <libcloudph++/blk_2m/cond_evap_formulae.hpp>
#include <libcloudph++/blk_2m/autoconversion_formulae.hpp>
#include <libcloudph++/blk_2m/accretion_formulae.hpp>
#include <libcloudph++/blk_2m/collision_sink_formulae.hpp>

using real_t = double;
namespace cm = libcloudphxx::common;
using namespace libcloudphxx::blk_2m;
using namespace libcloudphxx::blk_2m::formulae;

struct Mode { real_t mean_rd, sdev_rd, N_stp, chem_b; };

int main(int argc, char** argv) {
  real_t dt; sscanf(argv[1], "%lf", &dt);
  const real_t acnv_A = 1350, acnv_b = 2.47, acnv_c = -1.79, RH_max = 44;
  Mode modes[2] = {
    {0.02e-6, 1.4, 60e6, 0.55},
    {0.075e-6, 1.6, 40e6, 0.55},
  };
  real_t rhod_, th_, rv_, rc, nc, rr, nr;
  while (scanf("%lf %lf %lf %lf %lf %lf %lf",
               &rhod_, &th_, &rv_, &rc, &nc, &rr, &nr) == 7) {
    auto rhod = rhod_ * si::kilograms / si::cubic_metres;
    auto th = th_ * si::kelvins;
    quantity<si::dimensionless, real_t> rv(rv_);
    real_t dot_th = 0, dot_rv = 0, dot_rc = 0, dot_nc = 0, dot_rr = 0,
           dot_nr = 0;
    quantity<si::dimensionless, real_t> rr_dim(rr);
    auto nr_dim = nr / si::kilograms;
    auto T = cm::theta_dry::T<real_t>(th, rhod);
    auto p = cm::theta_dry::p<real_t>(rhod, rv, T);

    real_t local_dot_rc = 0, local_dot_rr = 0, local_dot_nc = 0,
           local_dot_nr = 0;
    bool cloud_limiter = false, rain_limiter = false;

    // activation
    if (real_t(rv) > real_t(cm::const_cp::r_vs<real_t>(T, p))) {
      quantity<divide_typeof_helper<si::dimensionless, si::mass>::type, real_t> n_ccn(0);
      for (auto &mode : modes)
        n_ccn = n_ccn + n_c_p<real_t>(p, T, rv, mode.mean_rd * si::metres,
                               quantity<si::dimensionless, real_t>(mode.sdev_rd),
                               mode.N_stp / si::cubic_metres,
                               quantity<si::dimensionless, real_t>(mode.chem_b),
                               quantity<si::dimensionless, real_t>(RH_max));
      auto tmp = activation_rate<real_t>(n_ccn, nc / si::kilograms,
                                         dt * si::seconds);
      local_dot_nc += real_t(tmp * si::kilograms * si::seconds);
      local_dot_rc += real_t(tmp * ccnmass<real_t>() * si::seconds);
    }
    // cond/evap
    if (rc > rc_eps<real_t>() && nc > nc_eps<real_t>()) {
      auto tmp = cond_evap_rate<real_t>(
        T, p, rv, tau_relax_c(T, p, r_drop_c(rc, nc, rhod),
                              rhod * (nc / si::kilograms)));
      local_dot_rc += real_t(tmp * si::seconds);
    }
    if (rr > rr_eps<real_t>() && nr > nr_eps<real_t>()) {
      real_t tmp = min(
        real_t(cond_evap_rate<real_t>(T, p, rv,
               tau_relax_r(T, rhod, rr_dim, nr_dim)) * si::seconds),
        real_t(0));
      local_dot_rr += tmp;
      local_dot_nr += tmp * nr / rr;
    }
    local_dot_rc = max(local_dot_rc, -rc / dt);
    local_dot_rr = max(local_dot_rr, -rr / dt);
    local_dot_nr = max(local_dot_nr, -nr / dt);
    if (local_dot_rc == -rc / dt) { local_dot_nc = -nc / dt; cloud_limiter = true; }
    if (local_dot_rr == -rr / dt) { local_dot_nr = -nr / dt; rain_limiter = true; }
    dot_rv -= (local_dot_rc + local_dot_rr);
    dot_th -= (local_dot_rc + local_dot_rr)
              * real_t(cm::theta_dry::d_th_d_rv<real_t>(T, th) / si::kelvins);
    dot_rc += local_dot_rc; dot_rr += local_dot_rr;
    dot_nc += local_dot_nc; dot_nr += local_dot_nr;
    local_dot_rc = local_dot_rr = local_dot_nc = local_dot_nr = 0;

    if (!cloud_limiter) {
      if (rc > rc_eps<real_t>() && nc > nc_eps<real_t>()) {
        real_t tmp = real_t(autoconv_rate(
          rc, nc, rhod,
          quantity<si::dimensionless, real_t>(acnv_A),
          quantity<si::dimensionless, real_t>(acnv_b),
          quantity<si::dimensionless, real_t>(acnv_c)) * si::seconds);
        tmp = min(tmp, rc / dt);
        local_dot_rc -= tmp;
        local_dot_rr += tmp;
        local_dot_nr += tmp / real_t(
          real_t(4)/3 * pi<real_t>()
          * real_t(cm::moist_air::rho_w<real_t>() * si::cubic_metres / si::kilograms)
          * real_t(drizzle_radius<real_t>() / si::metres)
          * real_t(drizzle_radius<real_t>() / si::metres)
          * real_t(drizzle_radius<real_t>() / si::metres));
        if (tmp == rc / dt) cloud_limiter = true;
      }
      if (!cloud_limiter && !rain_limiter) {
        if (rc > rc_eps<real_t>() && nc > nc_eps<real_t>() && rr > rr_eps<real_t>()) {
          real_t tmp = real_t(accretion_rate(rc, rr_dim) * si::seconds);
          local_dot_rc -= tmp;
          local_dot_rr += tmp;
          local_dot_rc = max(local_dot_rc, -rc / dt);
          if (local_dot_rc == -rc / dt) cloud_limiter = true;
        }
      }
      if (cloud_limiter) local_dot_nc = -nc / dt;
      else if (nc > nc_eps<real_t>() && local_dot_rr > rr_eps<real_t>()) {
        real_t tmp = real_t(collision_sink_rate(
          local_dot_rr / si::seconds, r_drop_c(rc, nc, rhod))
          * si::kilograms * si::seconds);
        tmp = min(tmp, nc / dt);
        local_dot_nc -= tmp;
      }
      dot_rc += local_dot_rc; dot_rr += local_dot_rr;
      dot_nc += local_dot_nc; dot_nr += local_dot_nr;
    }
    printf("%.17g %.17g %.17g %.17g %.17g %.17g\n",
           dot_th, dot_rv, dot_rc, dot_nc, dot_rr, dot_nr);
  }
  return 0;
}
