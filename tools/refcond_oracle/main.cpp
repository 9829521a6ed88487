// Element-wise oracle: the reference's advance_rw2 (backward-Euler wet
// growth, toms748) re-assembled from the reference's own header-only
// physics. Reads droplet rows from stdin, writes rw2_new per row.
#define __NVCC__ 1   // select fake_units (no Boost.Units available)
#include <cstdio>
#include <cmath>
#include <cstdint>
using std::sqrt; using std::pow; using std::exp; using std::log; using std::cbrt;
using std::abs; using std::min; using std::max; using std::isfinite;
#include <libcloudph++/common/units.hpp>
#include <libcloudph++/common/macros.hpp>
#include <libcloudph++/common/moist_air.hpp>
#include <libcloudph++/common/const_cp.hpp>
#include <libcloudph++/common/kappa_koehler.hpp>
#include <libcloudph++/common/kelvin_term.hpp>
#include <libcloudph++/common/maxwell-mason.hpp>
#include <libcloudph++/common/transition_regime.hpp>
#include <libcloudph++/common/ventil.hpp>
#include <libcloudph++/common/detail/toms748.hpp>

using real_t = double;
namespace cm = libcloudphxx::common;

struct minfun {
  real_t rw2_old, dt, rhod, rv, T, p, RH, eta, rd3, kpa, vt, RH_max, lD, lK;
  real_t drw2_dt(real_t rw2) const {
    using namespace cm::maxwell_mason;
    using namespace cm::kappa_koehler;
    using namespace cm::kelvin;
    using cm::moist_air::D_0; using cm::moist_air::K_0; using cm::moist_air::c_pd;
    using cm::transition_regime::beta;
    using cm::ventil::Sh; using cm::ventil::Nu;
    real_t rw = sqrt(rw2), rw3 = rw*rw*rw;
    auto qT = T * si::kelvins;
    auto Re = cm::ventil::Re(vt*si::metres_per_second, rw*si::metres,
                rhod*si::kilograms/si::cubic_metres, eta*si::pascals*si::seconds);
    auto Sc = cm::ventil::Sc(eta*si::pascals*si::seconds,
                rhod*si::kilograms/si::cubic_metres, D_0<real_t>());
    auto Pr = cm::ventil::Pr(eta*si::pascals*si::seconds, c_pd<real_t>(), K_0<real_t>());
    auto D = D_0<real_t>() * beta(quantity<si::dimensionless,real_t>(lD/rw)) * (Sh(Sc, Re) / real_t(2));
    auto K = K_0<real_t>() * beta(quantity<si::dimensionless,real_t>(lK/rw)) * (Nu(Pr, Re) / real_t(2));
    return real_t(2) * real_t(rdrdt(
      D, K,
      quantity<si::mass_density, real_t>(rhod*rv*si::kilograms/si::cubic_metres),
      qT, p*si::pascals,
      quantity<si::dimensionless,real_t>(RH > RH_max ? RH_max : RH),
      a_w(rw3*si::cubic_metres, rd3*si::cubic_metres,
          quantity<si::dimensionless,real_t>(kpa)),
      klvntrm(rw*si::metres, qT)));
  }
  real_t operator()(real_t rw2) const { return rw2_old + dt*drw2_dt(rw2) - rw2; }
};

int main(int argc, char** argv) {
  real_t dt, RH_max; 
  if (argc < 3) return 1;
  sscanf(argv[1], "%lf", &dt); sscanf(argv[2], "%lf", &RH_max);
  const real_t cond_mlt = 2;
  cm::detail::eps_tolerance<real_t> tol(sizeof(real_t)*8/4);
  real_t rw2_old, rd3, kpa, vt, rhod, rv, T, p, RH, eta, lD, lK;
  while (scanf("%lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf",
      &rw2_old,&rd3,&kpa,&vt,&rhod,&rv,&T,&p,&RH,&eta,&lD,&lK) == 12) {
    minfun f{rw2_old, dt, rhod, rv, T, p, RH, eta, rd3, kpa, vt, RH_max, lD, lK};
    real_t drw2 = dt * f.drw2_dt(rw2_old);
    real_t out;
    if (drw2 == 0) { out = rw2_old; }
    else {
      real_t rd2 = cbrt(rd3); rd2 = rd2*rd2;
      real_t a = max(rd2, rw2_old + min(real_t(0), cond_mlt*drw2));
      real_t b = rw2_old + max(real_t(0), cond_mlt*drw2);
      if (a == b) out = rw2_old;
      else {
        real_t fa, fb;
        if (drw2 > 0) { fa = drw2; fb = f(b); }
        else          { fa = f(a); fb = drw2; }
        if (fa*fb > 0) out = rw2_old + drw2;
        else { uintmax_t it = 100; out = cm::detail::toms748_solve(f, a, b, fa, fb, tol, it); }
        if (out < rd2) out = rd2;
      }
    }
    printf("%.17g\n", out);
  }
  return 0;
}
