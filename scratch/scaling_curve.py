"""Join two bench.py runs (e.g. sf0.1 BENCH_FULL.json and an sf1 run) and
classify per-query wall-time scaling.

    python scratch/scaling_curve.py BENCH_FULL.json /tmp/bench_sf1.json

With a 10x data ratio, a query whose wall grows ~10x is scan-bound
(linear — the healthy shape for a distributed engine), <<10x is bound by
the local-scheduler job floor or metadata-scale inputs, and >>10x is a
red flag (pair blow-up, driver-side O(n^2), spill) worth a plan audit.
Classification thresholds are deliberately loose: local[32] per-query
walls swing 2-4x run to run (documented in bench.py), so only the
aggregate shape and the >2x-superlinear outliers are meaningful.
"""

import json
import sys

lo_path, hi_path = sys.argv[1], sys.argv[2]
lo, hi = json.load(open(lo_path)), json.load(open(hi_path))
ratio_sf = hi["sf"] / lo["sf"]
print(f"data ratio: {ratio_sf:.0f}x  (sf {lo['sf']} -> {hi['sf']})")
cal_lo = lo.get("calibration", {}).get("jvm_fold_50m_ms")
cal_hi = hi.get("calibration", {}).get("jvm_fold_50m_ms")
if cal_lo and cal_hi:
    print(f"host speed drift (jvm fold): {cal_hi / cal_lo:.2f}x — ratios below are uncorrected")

rows = []
for name, w_lo in lo["queries"].items():
    w_hi = hi["queries"].get(name)
    if w_hi is None:
        continue
    rows.append((w_hi / w_lo, w_lo, w_hi, name))
rows.sort(reverse=True)

sub = sum(1 for r, *_ in rows if r < 0.5 * ratio_sf)
lin = sum(1 for r, *_ in rows if 0.5 * ratio_sf <= r <= 2 * ratio_sf)
sup = sum(1 for r, *_ in rows if r > 2 * ratio_sf)
print(f"{len(rows)} queries: {sub} sublinear (<{0.5 * ratio_sf:.0f}x), "
      f"{lin} ~linear, {sup} superlinear (>{2 * ratio_sf:.0f}x)")
print(f"total wall: {sum(w for _, w, _, _ in rows):.1f}s -> "
      f"{sum(w for _, _, w, _ in rows):.1f}s "
      f"({sum(w for _, _, w, _ in rows) / sum(w for _, w, _, _ in rows):.1f}x)")
print()
print(f"{'query':32s} {'sf_lo':>8s} {'sf_hi':>8s} {'ratio':>7s}")
for r, w_lo, w_hi, name in rows:
    flag = " <-- superlinear" if r > 2 * ratio_sf else ""
    print(f"{name:32s} {w_lo:8.2f} {w_hi:8.2f} {r:6.1f}x{flag}")
