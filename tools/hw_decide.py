#!/usr/bin/env python
"""Summarize a tools/hw_queue.sh run and recommend default flips.

Parses the per-step logs in the queue's log dir (default /tmp/hwq):
stage-7 component timings, golden-parity verdicts, 40-frame gate JSONs
and the bench line — then prints an A/B table plus which env-knob
defaults the numbers support flipping (OLS_GRAD_REDUCE, OLS_MULTISEG,
OLS_BLEND_CHUNK). Pure log parsing; safe to run any time.

Usage: python tools/hw_decide.py [/tmp/hwq]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

STAGE7_KEYS = (
    "preprocess", "binning", "pack+blend fwd (+assembly)", "full fwd+bwd"
)


def parse_stage7(path: Path):
    if not path.exists():
        return None
    out = {}
    for line in path.read_text().splitlines():
        m = re.match(r"\s+(.+): ([0-9.]+) ms$", line)
        if m and m.group(1) in STAGE7_KEYS:
            out[m.group(1)] = float(m.group(2))
    return out or None


def parse_parity(path: Path):
    if not path.exists():
        return None
    for line in path.read_text().splitlines():
        if '"all_ok"' in line:
            try:
                return json.loads(line)["all_ok"]
            except (json.JSONDecodeError, KeyError):
                pass
    return None


def parse_json_line(path: Path, key: str):
    if not path.exists():
        return None
    for line in path.read_text().splitlines():
        if line.startswith("{") and key in line:
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    return None


def main():
    log = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/hwq")

    def stage7_first(*names):
        for n in names:
            r = parse_stage7(log / f"{n}.log")
            if r:
                return r
        return None

    s7 = {
        "scatter (base)": stage7_first(
            "02_stage7_base", "02_stage7_scatter"),
        "emission": parse_stage7(log / "03_stage7_emission.log"),
        "multiseg": parse_stage7(log / "11_stage7_multiseg.log"),
        "multiseg+emission": parse_stage7(log / "12_stage7_ms_emission.log"),
        "scan_mxu bwd": parse_stage7(log / "16_stage7_scan_bwd.log"),
        "scan_mxu all": parse_stage7(log / "17_stage7_scan_all.log"),
        "multiseg+scan": parse_stage7(log / "18_stage7_ms_scan.log"),
        "n15k base": parse_stage7(log / "13_stage7_n15k_base.log"),
        "n15k best": stage7_first(
            "14_stage7_n15k_best", "14_stage7_n15k_ms"),
        "multiseg c512": parse_stage7(log / "15_stage7_ms_c512.log"),
    }
    print("=== stage-7 timings (ms) ===")
    hdr = ["variant"] + [k.split(" (")[0] for k in STAGE7_KEYS]
    print("  " + " | ".join(hdr))
    for name, row in s7.items():
        if row:
            print("  " + " | ".join(
                [name] + [f"{row.get(k, float('nan')):.1f}"
                          for k in STAGE7_KEYS]))
        else:
            print(f"  {name}: (missing)")

    def parity_first(*names):
        for n in names:
            v = parse_parity(log / f"{n}.log")
            if v is not None:
                return v
        return None

    parity = {
        "scatter": parity_first("04_parity_base", "04_parity_scatter"),
        "emission": parse_parity(log / "05_parity_emission.log"),
        "multiseg": parse_parity(log / "10_parity_multiseg.log"),
        "scan_all": parse_parity(log / "19_parity_scan_all.log"),
        "ms+scan": parse_parity(log / "20_parity_ms_scan.log"),
    }
    print("=== golden parity (all_ok) ===")
    for k, v in parity.items():
        print(f"  {k}: {v}")

    print("=== 40-frame gates ===")
    for name in ("07_gate40_cold", "08_gate40_warm", "16_gate40_best"):
        r = parse_json_line(log / f"{name}.log", '"fps"')
        if r:
            print(f"  {name}: fps={r['fps']} gates_ok={r.get('gates_ok')}"
                  f" psnr={r.get('psnr')} ate={r.get('ate')}"
                  f" lang_l1={r.get('lang_l1')}")
        else:
            print(f"  {name}: (missing)")

    b = parse_json_line(log / "09_bench.log", '"metric"')
    print(f"=== bench === {b}")

    # Recommendations: a knob flips only if its parity replay is green
    # AND it beats the baseline full fwd+bwd by >3% (tunnel variance).
    print("=== recommendations ===")
    base = (s7["scatter (base)"] or {}).get("full fwd+bwd")

    def rec(knob, variant, gate_ok):
        row = s7.get(variant) or {}
        t = row.get("full fwd+bwd")
        if base is None or t is None:
            print(f"  {knob}: insufficient data")
            return
        if gate_ok is False:
            print(f"  {knob}: DO NOT FLIP (parity failed)")
            return
        verdict = "FLIP" if t < base * 0.97 else "keep default"
        print(f"  {knob}: {t:.1f} vs {base:.1f} ms -> {verdict}"
              + ("" if gate_ok else " (parity missing — verify first)"))

    rec("OLS_GRAD_REDUCE=emission", "emission", parity["emission"])
    rec("OLS_MULTISEG=hybrid", "multiseg", parity["multiseg"])
    rec("OLS_MULTISEG=hybrid + emission", "multiseg+emission",
        parity["multiseg"] and parity["emission"]
        if None not in (parity["multiseg"], parity["emission"]) else None)
    rec("OLS_SCAN_MXU=bwd", "scan_mxu bwd", parity["scan_all"])
    rec("OLS_SCAN_MXU=all", "scan_mxu all", parity["scan_all"])
    rec("OLS_MULTISEG=hybrid + OLS_SCAN_MXU=all", "multiseg+scan",
        parity["ms+scan"])
    rec("OLS_BLEND_CHUNK=512 (under hybrid)", "multiseg c512",
        parity["multiseg"])


if __name__ == "__main__":
    sys.exit(main())
