"""Occupancy-weighted roofline for the v2/default architecture.

Answers "is the measured 63% MFU (123.8 TFLOP/s bf16, 8192^2) the
hardware ceiling for this net, or a scheduling shortfall?" the same way
BASELINE.md settles it for the legacy net: model each conv's achievable
MXU rate from its channel occupancy (128x128 systolic tiles fill only
``ceil``-tiled; partial tiles burn full passes), sum the per-layer ideal
times, and compare with the measurement.

The occupancy model (per conv, NHWC/HWIO on the MXU):
    eff = (Cin / (128*ceil(Cin/128))) * (Cout / (128*ceil(Cout/128)))
    ideal_time = flops / (PEAK * eff)
This charges nothing for HBM traffic or the elementwise BN/leaky chain,
so it is an upper bound on achievable throughput — the right comparator
for "is there scheduling headroom".

Run: python scripts/v2_roofline.py   (pure analysis, no TPU needed)
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unmicst_tpu.core import tiler
from unmicst_tpu.core.hp import HParams

PEAK = 197e12
SIZE = 8192
hp = HParams(im_size=64, n_channels=1, n_classes=3, n_out0=80,
             feat_maps_fact=2, down_samp_fact=2, ks=3, n_extra_convs=0,
             std_dev0=0.03, n_layers=4, batch_size=32)
MEASURED_S = 1.0616          # scripts/v2_stage_split_report.json, bf16
MEASURED_TFLOPS = 123.8


def occ(c: int) -> float:
    return c / (128.0 * math.ceil(c / 128.0))


def conv_row(label, hw, k2, cin, cout):
    fl = 2.0 * hw * k2 * cin * cout
    eff = occ(k2 * cin) * occ(cout)
    return {"layer": label, "gflop": fl / 1e9, "eff": round(eff, 3),
            "ideal_ms": fl / (PEAK * eff) * 1e3}


widths = hp.n_out_x
k2 = hp.ks * hp.ks
s = hp.im_size
rows = []
res = s
for i in range(hp.n_layers):
    hw = res * res
    # fused residual: kernel1 absorbs the shortcut (inference)
    rows.append(conv_row(f"down{i}.kernel1(fused)", hw, k2,
                         widths[i], widths[i + 1]))
    res //= hp.down_samp_fact
rows.append(conv_row("bottom", res * res, k2,
                     widths[hp.n_layers], widths[hp.n_layers + 1]))
for i in range(hp.n_layers - 1, -1, -1):
    in_hw = res * res
    res *= hp.down_samp_fact
    hw = res * res
    rows.append(conv_row(f"up{i}.transpose", in_hw, k2,
                         widths[i + 1], widths[i + 2]))
    rows.append(conv_row(f"up{i}.kernel2", hw, k2,
                         widths[i] + widths[i + 1], widths[i + 1]))
rows.append(conv_row("top.1x1", res * res, 1, widths[1], hp.n_classes))

grid = tiler.make_grid(SIZE, SIZE, hp.im_size, hp.margin)
n_tiles = grid.num_tiles
total_fl = sum(r["gflop"] for r in rows) * 1e9 * n_tiles
ideal_s = sum(r["ideal_ms"] for r in rows) / 1e3 * n_tiles
flat_s = total_fl / PEAK  # 100%-MXU fantasy

print(f"{'layer':22s} {'GFLOP/tile':>10s} {'occ eff':>8s} {'ideal ms/tile':>14s}")
for r in rows:
    print(f"{r['layer']:22s} {r['gflop']:10.3f} {r['eff']:8.3f} "
          f"{r['ideal_ms']:14.4f}")
print()
print(f"tiles for {SIZE}^2: {n_tiles}")
print(f"slide FLOP: {total_fl/1e12:.2f} T")
print(f"flat-peak time (eff=1):        {flat_s:8.3f} s")
print(f"occupancy-ideal time:          {ideal_s:8.3f} s "
      f"({total_fl/ideal_s/1e12:.1f} TFLOP/s)")
print(f"measured full pipeline:        {MEASURED_S:8.3f} s "
      f"({MEASURED_TFLOPS} TFLOP/s)")
print(f"measured / occupancy-ideal:    {ideal_s/MEASURED_S*100:8.1f} % "
      f"of achievable")

report = {
    "slide": SIZE, "n_tiles": n_tiles,
    "occupancy_ideal_s": round(ideal_s, 4),
    "occupancy_ideal_tflop_s": round(total_fl / ideal_s / 1e12, 1),
    "measured_s": MEASURED_S,
    "measured_tflop_s": MEASURED_TFLOPS,
    "fraction_of_achievable": round(ideal_s / MEASURED_S, 3),
    "per_layer": rows,
}
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "v2_roofline_report.json"), "w") as f:
    json.dump(report, f, indent=1)
