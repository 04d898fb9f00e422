"""Panel-curve analysis: does the policy HOLD the decisive threshold?

Reads a ``*_panel.jsonl`` (rows from the round-5 fixed-panel eval:
``{"epoch": e, "panel_mean": m, "panel_solved_frac": f}``) and the panel's
untrained random band (docs/curves/procmaze_panel_band.json, produced by
``round5_tpu_session.phase_panel_band``), then reports:

  - the decisive threshold (band mean + 3 sigma of untrained panel means);
  - every maximal run of consecutive epochs with panel_mean > threshold;
  - the longest such run and the final-W window mean (W=10 default);
  - the verdict string RESULTS.md quotes.

Unlike the round-4 criterion (a 10-epoch window of a 0.9-EMA of single
random-level episodes), the panel mean is a plain mean over the SAME 64
fixed levels every epoch — "holds" here is a property of the policy, not
of the level draw.

Usage: python tools/panel_analysis.py [panel_jsonl] [band_json] [W]
"""

import json
import os
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "curves")


def analyze(panel_path: str, band_path: str, final_w: int = 10) -> dict:
    with open(band_path) as f:
        band = json.load(f)
    thresh = band["threshold_3sigma"]
    rows = [json.loads(l) for l in open(panel_path) if l.strip()]
    if not rows:
        return {"panel_rows": 0, "threshold": thresh, "verdict": "no data"}
    # crash-resume can replay epochs between the last checkpoint and the
    # crash, appending duplicate rows: keep the LAST row per epoch (the one
    # from the trajectory that continued) and sort by epoch
    by_epoch = {r["epoch"]: r for r in rows}
    rows = [by_epoch[e] for e in sorted(by_epoch)]
    epochs = np.array([r["epoch"] for r in rows])
    means = np.array([r["panel_mean"] for r in rows])
    solved = np.array([float(r.get("panel_solved_frac", -1.0)) for r in rows])

    above = means > thresh
    runs = []
    start = None
    for i, a in enumerate(above):
        if a and start is None:
            start = i
        elif not a and start is not None:
            runs.append((int(epochs[start]), int(epochs[i - 1])))
            start = None
    if start is not None:
        runs.append((int(epochs[start]), int(epochs[-1])))
    longest = max(runs, key=lambda r: r[1] - r[0], default=None)

    out = {
        "panel_rows": len(rows),
        "epoch_range": [int(epochs[0]), int(epochs[-1])],
        "threshold": thresh,
        "band": {k: band[k] for k in ("mean", "std", "n_policies")},
        "epochs_above_threshold": int(above.sum()),
        "frac_above": round(float(above.mean()), 3),
        "runs_above": runs,
        "longest_run": longest,
        "longest_run_len": (longest[1] - longest[0] + 1) if longest else 0,
        f"final_{final_w}_mean": round(float(means[-final_w:].mean()), 3),
        f"final_{final_w}_min": round(float(means[-final_w:].min()), 3),
        "best_mean": round(float(means.max()), 3),
    }
    tail_solved = solved[-final_w:]
    if (tail_solved >= 0).all():  # -1 marks rows without the field
        out["final_solved_frac"] = round(float(tail_solved.mean()), 3)
    final_holds = bool(means[-final_w:].min() > thresh)
    out["verdict"] = (
        "HOLDS (final window entirely above threshold)" if final_holds
        else "touches but does not hold" if above.any()
        else "never crosses"
    )
    return out


def main():
    panel = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        OUT, "procmaze_impala_P4096_panel.jsonl")
    band = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        OUT, "procmaze_panel_band.json")
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(json.dumps(analyze(panel, band, w), indent=1))


if __name__ == "__main__":
    main()
