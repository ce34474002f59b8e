// Parity dump harness: drives the *reference's own headers* (mounted
// read-only at REF_SRC) over fixed deterministic input grids and writes
// raw float64 outputs for tests/test_parity.py to compare against the
// jax implementations. Build:
//   g++ -O3 -std=c++17 -I$REF_SRC benchmarks/reference_parity_dump.cpp
// Usage: ./a.out <euler|srhd|twobody> <out.bin>
// No reference code is vendored here; this file only calls its API.
// The state grids below are mirrored exactly (same loop order) by
// tests/test_parity.py — keep the two in sync.
#include <cmath>
#include <cstdio>
#include <cstring>
#include <stdexcept>
#include <vector>
#include "core_rational.hpp"  // provides the to_string overload srhd's
                              // throw sites need (as the reference's own
                              // TUs include it first, subprog_cloud.cpp:36)
#include "physics_euler.hpp"
#include "physics_iso2d.hpp"
#include "physics_srhd.hpp"
#include "model_two_body.hpp"

static std::vector<double> out;
static void put(double v) { out.push_back(v); }

static double val(double x) { return x; }
template<int C, int G, int S, typename T>
static double val(mara::dimensional_value_t<C, G, S, T> x) { return x.value; }

template<typename Seq5>
static void put5(const Seq5& s)
{
    for (int k = 0; k < 5; ++k)
        put(val(s[k]));
}

template<typename Mat>
static void put_diag5(const Mat& m)
{
    for (int i = 0; i < 5; ++i)
        put(val(m(i, i)));
}

template<typename Mat>
static void put25(const Mat& m)
{
    for (int i = 0; i < 5; ++i)
        for (int j = 0; j < 5; ++j)
            put(val(m(i, j)));
}

// ---------------------------------------------------------------------------
// euler: recovery (exact + floored), HLLE, full eigensystem + flux Jacobian
// (physics_euler.hpp:347-640)
// ---------------------------------------------------------------------------
static void dump_euler()
{
    const double gamma = 5.0 / 3.0;
    std::vector<mara::euler::primitive_t> states;
    for (double rho : {0.1, 1.0, 2.5})
        for (double u : {-0.5, 0.0, 0.7})
            for (double v : {0.25, -1.0})
                for (double p : {0.01, 1.0, 10.0})
                    states.push_back(mara::euler::primitive_t()
                        .with_mass_density(rho)
                        .with_velocity_1(u)
                        .with_velocity_2(v)
                        .with_velocity_3(0.1 * u - 0.2 * v)
                        .with_gas_pressure(p));

    for (auto& P : states) {
        auto U = P.to_conserved_density(gamma);
        put5(U);
        put5(mara::euler::recover_primitive(U, gamma, 0.0));
        put5(mara::euler::recover_primitive(U, gamma, 1e-2));
        put_diag5(P.eigenvalues(gamma));
        put25(P.flux_jacobian(gamma));
        put25(P.right_eigenvectors(gamma));
        put25(P.left_eigenvectors(gamma));
    }
    // a state manufactured so the exact recovery goes negative and the
    // temperature floor engages (physics_euler.hpp:570-573)
    {
        auto Uf = mara::euler::conserved_density_t();
        Uf[0].value = 1.0; Uf[1].value = 2.0; Uf[2].value = 0.0;
        Uf[3].value = 0.0; Uf[4].value = 1.5;  // KE = 2.0 > E
        put5(Uf);
        put5(mara::euler::recover_primitive(Uf, gamma, 1e-2));
    }
    for (size_t i = 0; i + 1 < states.size(); ++i) {
        put5(mara::euler::riemann_hlle(states[i], states[i + 1],
             mara::unit_vector_t::on_axis_1(), gamma));
        put5(mara::euler::riemann_hlle(states[i], states[i + 1],
             mara::unit_vector_t::on_axis_2(), gamma));
    }
}

// ---------------------------------------------------------------------------
// srhd: Newton recovery trajectory incl. near-floor states, HLLE
// (physics_srhd.hpp:364-440, 466-490)
// ---------------------------------------------------------------------------
static void dump_srhd()
{
    const double gamma = 4.0 / 3.0;
    std::vector<mara::srhd::primitive_t> states;
    for (double rho : {0.1, 1.0, 10.0})
        for (double ur : {0.0, 0.5, 2.0, 10.0})
            for (double uq : {0.0, -1.5})
                for (double p : {1e-6, 1e-2, 1.0, 100.0})
                    states.push_back(mara::srhd::primitive_t()
                        .with_mass_density(rho)
                        .with_gamma_beta_1(ur)
                        .with_gamma_beta_2(uq)
                        .with_gamma_beta_3(0.25 * uq)
                        .with_gas_pressure(p));

    for (auto& P : states) {
        auto U = P.to_conserved_density(gamma);
        put5(U);
        put5(mara::srhd::recover_primitive(U, gamma, 0.0));
        // near-floor branch: floor above some recovered pressures
        put5(mara::srhd::recover_primitive(U, gamma, 1e-4));
    }
    for (size_t i = 0; i + 1 < states.size(); ++i)
        put5(mara::srhd::riemann_hlle(states[i], states[i + 1],
             mara::unit_vector_t::on_axis_1(), gamma));
}

// ---------------------------------------------------------------------------
// two-body: Kepler solve + element inversion round trip
// (model_two_body.hpp:131-209, 296-360)
// ---------------------------------------------------------------------------
static void put_state(const mara::two_body_state_t& s)
{
    put(s.body1.mass); put(s.body1.position_x); put(s.body1.position_y);
    put(s.body1.velocity_x); put(s.body1.velocity_y);
    put(s.body2.mass); put(s.body2.position_x); put(s.body2.position_y);
    put(s.body2.velocity_x); put(s.body2.velocity_y);
}

static void put_elements(const mara::full_orbital_elements_t& e)
{
    put(e.pomega); put(e.tau);
    put(e.cm_position_x); put(e.cm_position_y);
    put(e.cm_velocity_x); put(e.cm_velocity_y);
    put(e.elements.separation); put(e.elements.total_mass);
    put(e.elements.mass_ratio); put(e.elements.eccentricity);
}

static void dump_twobody()
{
    for (double a : {1.0, 2.0})
        for (double M : {1.0, 3.0})
            for (double q : {1.0, 0.5, 0.2})
                for (double e : {0.0, 0.1, 0.6})
                    for (double pomega : {0.0, 0.7})
                        for (double t : {0.0, 0.45, 1.7, 6.0}) {
                            auto full = mara::full_orbital_elements_t();
                            full.elements.separation = a;
                            full.elements.total_mass = M;
                            full.elements.mass_ratio = q;
                            full.elements.eccentricity = e;
                            full.pomega = pomega;
                            full.tau = 0.3;
                            full.cm_position_x = 0.05;
                            full.cm_position_y = -0.02;
                            full.cm_velocity_x = 0.01;
                            full.cm_velocity_y = 0.03;
                            auto s = mara::compute_two_body_state(full, t);
                            put_state(s);
                            put_elements(mara::compute_orbital_elements(s, t));
                        }
}

// ---------------------------------------------------------------------------
// iso2d HLLC: star-region scalars + interface fluxes on both axes, with
// per-side sound speeds (physics_iso2d.hpp:610-712)
// ---------------------------------------------------------------------------
template<typename Flux3>
static void put3(const Flux3& f)
{
    put(mara::get<0>(f).value);
    put(mara::get<1>(f).value);
    put(mara::get<2>(f).value);
}

static void dump_iso2d_hllc()
{
    std::vector<mara::iso2d::primitive_t> states;
    for (double sg : {0.1, 1.0, 5.0})
        for (double vx : {-0.6, 0.0, 0.8})
            for (double vy : {0.3, -0.4})
                states.push_back(mara::iso2d::primitive_t()
                    .with_sigma(sg)
                    .with_velocity_x(vx)
                    .with_velocity_y(vy));

    auto xh = mara::unit_vector_t::on_axis_1();
    auto yh = mara::unit_vector_t::on_axis_2();
    for (size_t i = 0; i + 1 < states.size(); ++i) {
        double cs2l = 0.05 + 0.07 * (i % 3);
        double cs2r = 0.03 + 0.11 * (i % 4);
        auto v = mara::iso2d::compute_hllc_variables(
            states[i], states[i + 1], cs2l, cs2r, xh);
        put(v.pstar); put(v.sl); put(v.sr); put(v.sstar);
        put3(mara::iso2d::riemann_hllc(states[i], states[i + 1],
                                       cs2l, cs2r, xh));
        put3(mara::iso2d::riemann_hllc(states[i], states[i + 1],
                                       cs2l, cs2r, yh));
    }
}

int main(int argc, char** argv)
{
    if (argc < 3) { std::fprintf(stderr, "usage: %s <mode> <out>\n", argv[0]); return 2; }
    if      (!std::strcmp(argv[1], "euler"))   dump_euler();
    else if (!std::strcmp(argv[1], "srhd"))    dump_srhd();
    else if (!std::strcmp(argv[1], "twobody")) dump_twobody();
    else if (!std::strcmp(argv[1], "iso2d"))   dump_iso2d_hllc();
    else { std::fprintf(stderr, "unknown mode %s\n", argv[1]); return 2; }

    FILE* f = std::fopen(argv[2], "wb");
    std::fwrite(out.data(), sizeof(double), out.size(), f);
    std::fclose(f);
    std::printf("%zu doubles\n", out.size());
    return 0;
}
