"""Merge the round-5 scaling-model runs into ONE artifact with
predictions: m20 from SCALING_MODEL_A (flat+rec t1, flat phases),
m21..24 from the REC runs (flat + rec-structured phases), predicted
efficiency per (m, D) with the better-measured per-device structure.

Usage: python tools/merge_scaling_r05.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_model import predict  # noqa: E402

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")


def main():
    measured = []
    seen = set()
    for fname in ("SCALING_MODEL_REC_A_r05.json", "SCALING_MODEL_REC_B_r05.json",
                  "SCALING_MODEL_A_r05.json", "SCALING_MODEL_B_r05.json"):
        path = os.path.join(ART, fname)
        if not os.path.exists(path):
            continue
        for rows in json.load(open(path))["measured"]:
            if rows["m"] not in seen:  # REC runs (listed first) win
                seen.add(rows["m"])
                rows["source"] = fname
                measured.append(rows)
    measured.sort(key=lambda r: r["m"])
    # m24 t1 band: the D=1 whole-transform reading swings hugely with
    # session state (flat+tabs balanced: 7.8 / 15.3 / 19.8-20.9 ms across
    # four same-protocol measurements; rec stable at 17.2-17.4) while the
    # per-device phase terms reproduce within 1-2%.  Publish the repeat
    # session's t1 (15.33 ms -- the session whose phases also reproduced
    # REC_B's) and record the band.
    rep_path = os.path.join(ART, "SCALING_MODEL_M24_REPEAT_r05.json")
    if os.path.exists(rep_path):
        rep = json.load(open(rep_path))["measured"][0]
        for rows in measured:
            if rows["m"] == 24:
                rows["t1_us_band"] = sorted(
                    [rows["t1_flat_us"], rows["t1_rec_us"],
                     rep["t1_flat_us"], rep["t1_rec_us"]])
                rows["t1_us"] = rep["t1_us"]
                rows["t1_note"] = (
                    "D=1 flat t1 swings 7.8-20.9 ms with session state; "
                    "phases reproduce within 1-2% (M24_REPEAT). Published "
                    "t1 = the repeat session's; see t1_us_band.")
    wl = 90.0
    out = {"ici_gbs_per_link_dir_assumed": wl, "measured": measured,
           "predicted": {}}
    for rows in measured:
        table = predict(rows, wl)
        out["predicted"][f"m{rows['m']}"] = table
        print(f"N=2^{rows['m']} b{rows['batch']} (t1 {rows['t1_us']} us/t, "
              f"src {rows['source']}):")
        for r in table:
            print(f"  D={r['D']:2d} [{r['structure']:4s}]: "
                  f"p1 {r['p1_us']:8.2f} + p2 {r['p2_us']:8.2f} + a2a "
                  f"{r['a2a_us']:7.2f} -> speedup {r['speedup']:5.2f}x, "
                  f"eff {r['efficiency_pct']:5.1f}%")
    dst = os.path.join(ART, "SCALING_MODEL_r05.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
