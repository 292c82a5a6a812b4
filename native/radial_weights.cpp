// Exact-area radial-spectrum weights, sparse builder.
//
// Native equivalent of the host-side weight construction in the reference's
// utils/ExactRadialSpectrum.jl (there: dense per-radius matrices built in
// Julia). Computes, for every spectral cell, its exact area overlap with
// each annulus r in (radii[b-1], radii[b]] using the closed-form
// disk/rectangle intersection, emitting sparse COO entries. O(cells *
// bins-touched-per-cell), no dense (R, nl, nkr) intermediate — required for
// 1024^2+ grids where the dense tensor would be gigabytes.
//
// C ABI for ctypes (see juliaraytracingsw_tpu/analysis/radial.py).

#include <cmath>
#include <cstdint>
#include <algorithm>

namespace {

double antideriv(double x, double r) {
    // integral of sqrt(r^2 - t^2) dt from 0 to x, for x in [0, r]
    x = std::max(0.0, std::min(x, r));
    double s = std::sqrt(std::max(r * r - x * x, 0.0));
    return 0.5 * (x * s + r * r * std::asin(std::min(std::max(x / r, -1.0), 1.0)));
}

// area of disk(radius) intersect [W,E]x[S,N], all coords >= 0
double quadrant_area(double W, double E, double S, double N, double r) {
    if (W * W + S * S >= r * r) return 0.0;
    if (E * E + N * N <= r * r) return (E - W) * (N - S);
    W = std::min(W, r);
    E = std::min(E, r);
    double xN = std::sqrt(std::max(r * r - N * N, 0.0));
    double xa = std::min(std::max(xN, W), E);
    double xS = std::sqrt(std::max(r * r - S * S, 0.0));
    double xb = std::min(std::max(xS, W), E);
    double full = (N - S) * std::max(xa - W, 0.0);
    double partial = (antideriv(xb, r) - antideriv(xa, r))
                     - S * std::max(xb - xa, 0.0);
    return full + std::max(partial, 0.0);
}

}  // namespace

extern "C" {

// Emits COO entries (bin, cell_flat, weight) for all cells and annuli.
// kr: nkr non-negative x wavenumbers; labs: nl |l| values; radii: ascending.
// dbl: per-kr-column conjugate doubling factors (len nkr).
// out_* must have capacity max_entries; returns number of entries, or -1 if
// capacity was insufficient.
int64_t radial_weights_sparse(
    int32_t nl, int32_t nkr,
    const double* kr, const double* labs, const double* dbl,
    int32_t nradii, const double* radii,
    int64_t max_entries,
    int32_t* out_bin, int64_t* out_cell, double* out_weight) {
    const double dk = kr[1] - kr[0];
    const double h = dk / 2.0;
    int64_t count = 0;

    for (int32_t iy = 0; iy < nl; ++iy) {
        const double la = labs[iy];
        double S = std::max(la - h, 0.0);
        double N = la + h;
        if (la == 0.0) { S = 0.0; N = h; }
        for (int32_t ix = 0; ix < nkr; ++ix) {
            const double k = kr[ix];
            double W = std::max(k - h, 0.0);
            double E = k + h;
            if (ix == 0) { W = 0.0; E = h; }
            const double cell = (E - W) * (N - S);
            const double rmin = std::sqrt(W * W + S * S);
            const double rmax = std::sqrt(E * E + N * N);

            // first bin whose radius exceeds rmin
            int32_t b0 = int32_t(
                std::lower_bound(radii, radii + nradii, rmin) - radii);
            double prev_area = 0.0;
            if (b0 > 0) {
                // area below radii[b0-1] is 0 by construction of b0
                prev_area = 0.0;
            }
            for (int32_t b = b0; b < nradii; ++b) {
                const double r = radii[b];
                double area;
                if (r >= rmax) {
                    area = cell;
                } else {
                    area = quadrant_area(W, E, S, N, r);
                }
                const double w = (area - prev_area) / cell;
                if (w > 1e-14) {
                    if (count >= max_entries) return -1;
                    out_bin[count] = b;
                    out_cell[count] = int64_t(iy) * nkr + ix;
                    out_weight[count] = w * dbl[ix];
                    ++count;
                }
                prev_area = area;
                if (r >= rmax) break;
            }
        }
    }
    return count;
}

}  // extern "C"
