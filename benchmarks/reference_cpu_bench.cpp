// CPU baseline harness: drives the *reference's own headers* (mounted
// read-only at REF_SRC) through the same PLM + HLLE iso2d update measured
// by bench.py, to populate the CPU column of BASELINE.md. Build:
//   g++ -O3 -std=c++17 -I$REF_SRC benchmarks/reference_cpu_bench.cpp
// No reference code is vendored here; this file only calls its API.
#include <chrono>
#include <stdexcept>
#include <cmath>
#include <cstdlib>
#include <cstdio>
#include <vector>
#include "physics_iso2d.hpp"
#include "math_interpolation.hpp"

int main(int argc, char** argv)
{
    const int N = argc > 1 ? atoi(argv[1]) : 1024;
    const int STEPS = argc > 2 ? atoi(argv[2]) : 5;
    const double cs2 = 0.1, dx = 2.0 / N, dt = 0.4 * dx;

    using P = mara::iso2d::primitive_t;
    std::vector<P> p(N * N), p1(N * N);
    for (int i = 0; i < N; ++i)
        for (int j = 0; j < N; ++j) {
            double x = -1 + 2.0 * (i + 0.5) / N;
            double y = -1 + 2.0 * (j + 0.5) / N;
            p[i * N + j] = P()
                .with_sigma(1.0 + 0.5 * std::exp(-(x * x + y * y) / 0.1))
                .with_velocity_x(0.1 * std::sin(2 * M_PI * y))
                .with_velocity_y(-0.1 * std::sin(2 * M_PI * x));
        }

    auto at = [&](const std::vector<P>& a, int i, int j) -> const P& {
        return a[((i + N) % N) * N + ((j + N) % N)];
    };

    auto t0 = std::chrono::high_resolution_clock::now();
    for (int s = 0; s < STEPS; ++s) {
        for (int i = 0; i < N; ++i)
            for (int j = 0; j < N; ++j) {
                auto xh = mara::unit_vector_t::on_axis_1();
                auto yh = mara::unit_vector_t::on_axis_2();
                // PLM face states and HLLE on both faces of the cell,
                // exactly the reference flux pattern
                auto gxm = mara::plm_gradient(at(p,i-2,j), at(p,i-1,j), at(p,i,j), 1.8);
                auto gx0 = mara::plm_gradient(at(p,i-1,j), at(p,i,j), at(p,i+1,j), 1.8);
                auto gxp = mara::plm_gradient(at(p,i,j), at(p,i+1,j), at(p,i+2,j), 1.8);
                auto fxl = mara::iso2d::riemann_hlle(
                    at(p,i-1,j) + gxm * 0.5, at(p,i,j) - gx0 * 0.5, cs2, cs2, xh);
                auto fxr = mara::iso2d::riemann_hlle(
                    at(p,i,j) + gx0 * 0.5, at(p,i+1,j) - gxp * 0.5, cs2, cs2, xh);
                auto gym = mara::plm_gradient(at(p,i,j-2), at(p,i,j-1), at(p,i,j), 1.8);
                auto gy0 = mara::plm_gradient(at(p,i,j-1), at(p,i,j), at(p,i,j+1), 1.8);
                auto gyp = mara::plm_gradient(at(p,i,j), at(p,i,j+1), at(p,i,j+2), 1.8);
                auto fyl = mara::iso2d::riemann_hlle(
                    at(p,i,j-1) + gym * 0.5, at(p,i,j) - gy0 * 0.5, cs2, cs2, yh);
                auto fyr = mara::iso2d::riemann_hlle(
                    at(p,i,j) + gy0 * 0.5, at(p,i,j+1) - gyp * 0.5, cs2, cs2, yh);
                auto u0 = at(p,i,j).to_conserved_per_area();
                auto u1 = u0 - (fxr - fxl + fyr - fyl) * mara::make_time(dt) / mara::make_length(dx);
                p1[i * N + j] = mara::iso2d::recover_primitive(u1);
            }
        std::swap(p, p1);
    }
    auto t1 = std::chrono::high_resolution_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();

    if (argc > 3) {
        // dump the final primitive state as raw doubles [N, N, 3] for the
        // round-off parity check against the jax scheme (tests/test_parity.py)
        FILE* f = std::fopen(argv[3], "wb");
        for (int i = 0; i < N * N; ++i) {
            double row[3] = {p[i].sigma(), p[i].velocity_x(), p[i].velocity_y()};
            std::fwrite(row, sizeof(double), 3, f);
        }
        std::fclose(f);
    }
    std::printf("{\"metric\": \"reference_cpu_iso2d_plm_hlle\", \"N\": %d, "
                "\"steps\": %d, \"zones_per_second\": %.4e}\n",
                N, STEPS, double(N) * N * STEPS / secs);
    return 0;
}
