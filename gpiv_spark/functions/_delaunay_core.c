/* Bowyer-Watson insertion core — exact C port of the NumPy loop in
 * delaunay.py (same insertion order, same float expression order, same
 * tie handling, same slot-reuse discipline), so the emitted triangle
 * array is BIT-IDENTICAL to the pure-NumPy path; the Python wrapper
 * asserts nothing semantically new. Compile WITHOUT fp contraction or
 * fast-math (see _delaunay_cc.py) — an FMA would change rounding and
 * break the twin property.
 *
 * Why it exists: the NumPy loop pays ~40 us of interpreter/temporary
 * overhead per insertion, and its per-insertion full-range temporaries
 * (dx, dy arrays over every live slot) stream DRAM; at 32 concurrent
 * executor kernels the build is memory-bandwidth-bound (round-4/5
 * finding). This port keeps the live circumcircle table L2-resident
 * (one fused read pass per insertion) and does the cavity bookkeeping
 * in plain C.
 *
 * Layout contract with the wrapper (all buffers allocated by caller):
 *   pts[2*i], pts[2*i+1]   centered input points (n rows)
 *   allp                   pts + 3 super-triangle rows (n+3 rows)
 *   order[n]               insertion order (argsort twin of the NumPy path)
 *   tri[3*cap], ccx[cap], ccy[cap], rr[cap], alive[cap]
 *   returns hi (slots used) or -1 when cap was too small (caller grows
 *   cap exactly like np.resize doubling and retries from scratch).
 */

#include <math.h>
#include <stdint.h>

int64_t gpiv_delaunay_core(const double *pts, const double *allp,
                           const int64_t *order, int64_t n,
                           int64_t *tri, double *ccx, double *ccy,
                           double *rr, uint8_t *alive, int64_t cap,
                           int64_t *free_stack, int64_t *bad_buf,
                           int64_t *edge_buf)
{
    int64_t hi = 1;      /* slot 0 = super-triangle, set by wrapper */
    int64_t n_free = 0;

    for (int64_t oi = 0; oi < n; oi++) {
        const int64_t i = order[oi];
        const double px = pts[2 * i];
        const double py = pts[2 * i + 1];

        /* one fused scan over live slots: (ccx-px)^2 + (ccy-py)^2 < rr */
        int64_t n_bad = 0;
        for (int64_t t = 0; t < hi; t++) {
            double dx = ccx[t] - px;
            dx *= dx;
            double dy = ccy[t] - py;
            dy *= dy;
            dx += dy;
            if (dx < rr[t] && alive[t])
                bad_buf[n_bad++] = t;
        }
        if (n_bad == 0)
            continue;   /* on/outside all circumcircles (duplicate) */

        /* boundary polygon: edges used exactly once among bad tris.
         * edge_buf rows: [lo, hi, ori0, ori1, dead] in encounter order —
         * mirrors the Python dict's insertion-ordered semantics. */
        int64_t n_edges = 0;
        for (int64_t b = 0; b < n_bad; b++) {
            const int64_t bi = bad_buf[b];
            const int64_t a = tri[3 * bi];
            const int64_t bb = tri[3 * bi + 1];
            const int64_t c = tri[3 * bi + 2];
            const int64_t es[3][2] = {{a, bb}, {bb, c}, {c, a}};
            for (int e = 0; e < 3; e++) {
                const int64_t e0 = es[e][0];
                const int64_t e1 = es[e][1];
                const int64_t klo = e0 < e1 ? e0 : e1;
                const int64_t khi = e0 < e1 ? e1 : e0;
                int found = 0;
                for (int64_t k = 0; k < n_edges; k++) {
                    if (edge_buf[5 * k] == klo && edge_buf[5 * k + 1] == khi) {
                        edge_buf[5 * k + 4] = 1;   /* second use: dead */
                        found = 1;
                        break;
                    }
                }
                if (!found) {
                    edge_buf[5 * n_edges] = klo;
                    edge_buf[5 * n_edges + 1] = khi;
                    edge_buf[5 * n_edges + 2] = e0;
                    edge_buf[5 * n_edges + 3] = e1;
                    edge_buf[5 * n_edges + 4] = 0;
                    n_edges++;
                }
            }
            alive[bi] = 0;
            free_stack[n_free++] = bi;
        }

        /* new fan: one triangle per boundary edge, slots reused LIFO */
        for (int64_t k = 0; k < n_edges; k++) {
            if (edge_buf[5 * k + 4])
                continue;
            int64_t slot;
            if (n_free > 0)
                slot = free_stack[--n_free];
            else {
                slot = hi++;
                if (hi > cap)
                    return -1;   /* caller grows + retries */
            }
            const int64_t t0 = edge_buf[5 * k + 2];
            const int64_t t1 = edge_buf[5 * k + 3];
            tri[3 * slot] = t0;
            tri[3 * slot + 1] = t1;
            tri[3 * slot + 2] = i;

            /* circumcircle, scalar math in the wrapper's expression
             * order (delaunay.py lines 114-132) */
            const double ax = allp[2 * t0];
            const double ay = allp[2 * t0 + 1];
            const double bx = allp[2 * t1];
            const double by = allp[2 * t1 + 1];
            const double cx2 = allp[2 * i];
            const double cy2 = allp[2 * i + 1];
            double d = 2.0 * ((bx - ax) * (cy2 - ay) - (by - ay) * (cx2 - ax));
            if (-1e-300 < d && d < 1e-300)
                d = 1e-300;
            const double a2 = ax * ax + ay * ay;
            const double b2 = bx * bx + by * by;
            const double c2 = cx2 * cx2 + cy2 * cy2;
            const double ux = (a2 * (by - cy2) + b2 * (cy2 - ay) + c2 * (ay - by)) / d;
            const double uy = (a2 * (cx2 - bx) + b2 * (ax - cx2) + c2 * (bx - ax)) / d;
            ccx[slot] = ux;
            ccy[slot] = uy;
            /* pow(), NOT rx*rx: the Python twin writes
             * (ax-ux) ** 2 + (ay-uy) ** 2, and CPython's float power
             * is libm pow, which differs from the multiply by 1 ulp on
             * ~0.1% of inputs (measured) — enough to flip a duplicate
             * point's on-circle test and break bit-identity. */
            rr[slot] = pow(ax - ux, 2.0) + pow(ay - uy, 2.0);
            alive[slot] = 1;
        }
    }
    return hi;
}
