"""Full-protocol parity gate at real DBP15K scale (15K entities/side).

VERDICT r3 item 1.  The canonical ja_en workload (reference run_snag.sh:
batch 3500, GAT d=300, Mformer 1L/1H, CSLS k=3, --il through the stage
transition, noise 0.2/0.7) co-run on identical exported files with a fixed
12-epoch budget — the smallest budget that executes the complete IL
protocol (mining every stage-2 epoch, promotion at epoch 9, train-pool
refresh; reference main.py:181,222).

The co-run itself takes ~2h (two reference seeds x ~50 min on this 1-core
CPU; ours ~6 min/seed on TPU), so this test gates on artifacts: fresh runs
under /tmp/parity15k (scripts/parity_15k.py) when present, else the logs
COMMITTED under tests/data/parity15k/ (generated 2026-08-19/20) — the gate
can never silently skip on a fresh box (VERDICT r4 weak #3).  Set
SNAG_RUN_15K=1 to regenerate the full pipeline inside the test instead.

Gate calibration: the 4K-entity gate (test_scale_parity.py) uses 0.035 on
two-seed means against a measured +-1.5 pt per-seed draw spread.  At 15K
(10.5K test pairs, ~0.01 pt/rank-flip) the measured per-seed spread is
smaller — reference 0.658/0.653 over seeds 3408/17 (2026-08-19) — so the
gates are: the BASELINE.md 0.5-pt north-star band on the two-seed MEAN
(measured gap −0.05 pt leaves 10x headroom), plus a 3.5-pt per-seed
backstop against one-seed flukes hiding in the mean (a single seed's draw
spread is wider than the paired mean's).
"""

import json
import os
import os.path as osp
import re
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
ROOT = os.environ.get("SNAG_15K_ROOT", "/tmp/parity15k")
COMMITTED = osp.join(REPO, "tests", "data", "parity15k")
SEEDS = (3408, 17)
RES_RE = re.compile(r"Res:\[([\d.]+)\t([\d.]+)\t([\d.]+)\]")


def _final_mrr(log):
    m = RES_RE.findall(open(log).read())
    return float(m[-1][2]) if m else None


def _log_path(side, seed):
    """Prefer a fresh run under ROOT; fall back to the committed artifact."""
    fresh = osp.join(ROOT, f"{side}_{seed}.log")
    if osp.exists(fresh) and _final_mrr(fresh) is not None:
        return fresh
    return osp.join(COMMITTED, f"{side}_{seed}.log")


def _ensure_artifacts():
    def _done(side, seed):
        log = _log_path(side, seed)
        # a log without a final Res line is an in-progress or crashed run —
        # treat it as missing, not as a parity failure
        return osp.exists(log) and _final_mrr(log) is not None

    missing = [f"{side}_{seed}.log" for side in ("ref", "ours")
               for seed in SEEDS if not _done(side, seed)]
    if not missing:
        return
    if os.environ.get("SNAG_RUN_15K") != "1":
        pytest.fail(
            f"15K co-run artifacts missing: {missing} (checked {ROOT} and "
            f"the committed {COMMITTED}). Run `python scripts/parity_15k.py "
            "export|ref|ours` or set SNAG_RUN_15K=1 to run inside the test.")
    script = osp.join(REPO, "scripts", "parity_15k.py")
    subprocess.run([sys.executable, script, "export", "--root", ROOT],
                   check=True, timeout=3600)
    for seed in SEEDS:
        for side in ("ref", "ours"):
            if _done(side, seed):
                continue
            subprocess.run(
                [sys.executable, script, side, "--seed", str(seed),
                 "--root", ROOT], check=True, timeout=4 * 3600)


def test_15k_full_protocol_two_seed_mean():
    _ensure_artifacts()
    ref = {s: _final_mrr(_log_path("ref", s)) for s in SEEDS}
    ours = {s: _final_mrr(_log_path("ours", s)) for s in SEEDS}
    assert all(v is not None for v in ref.values()), f"ref logs corrupt: {ref}"
    assert all(v is not None for v in ours.values()), (
        f"ours logs corrupt: {ours}")

    ref_mean = sum(ref.values()) / len(SEEDS)
    our_mean = sum(ours.values()) / len(SEEDS)
    report = {"ref": ref, "ours": ours,
              "ref_mean": round(ref_mean, 4), "our_mean": round(our_mean, 4),
              "gap": round(our_mean - ref_mean, 4)}
    if os.access(ROOT, os.W_OK):
        with open(osp.join(ROOT, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))

    # the BASELINE.md north-star band: two-seed mean within 0.5 pt of the
    # reference (measured 2026-08-20: gap −0.05 pt — 10x headroom)
    assert our_mean >= ref_mean - 0.005, report
    # per-seed backstop: no single seed may trail badly (catches one-seed
    # flukes hiding in the mean; per-seed draws spread wider than the mean)
    for s in SEEDS:
        assert ours[s] >= ref[s] - 0.035, (s, report)
    # both frameworks must actually have trained (guards against a silent
    # short-circuit making the diff trivially zero)
    assert ref_mean > 0.5 and our_mean > 0.5, report


def test_15k_il_protocol_executed():
    """Both sides must have run the IL stage machinery (mining logged at
    every stage-2 epoch, promotion attempted at epoch 9)."""
    for side in ("ref", "ours"):
        log = _log_path(side, 3408)
        assert osp.exists(log), f"{log} missing"
        text = open(log).read()
        assert "[epoch 9]" in text and "candidate set" in text, side


def test_15k_il_heavy_40epoch():
    """IL-heavy co-run (VERDICT r4 next item 4): 40 epochs at the same
    geometry — stage 2 runs epochs 6..39 with mining every epoch, FOUR
    promote cycles (epochs 9/19/29/39) and seven train-pool refreshes,
    deep into pool drain-down.  Gates on the `--variant il40` artifacts
    (fresh under ROOT, else committed); single seed (the reference side
    costs ~3.4 h of 1-core CPU).

    Gate: final-MRR within the 4K-calibrated per-seed spread (0.035), and
    the eval-by-eval trajectory must not diverge: each of the last three
    common eval epochs within 0.06 (trajectory tolerance of the 800-entity
    oracle, test_reference_parity_e2e.py).
    """
    seed = 3408

    def _p(side):
        fresh = osp.join(ROOT, f"{side}_il40_{seed}.log")
        if osp.exists(fresh) and _final_mrr(fresh) is not None:
            return fresh
        return osp.join(COMMITTED, f"{side}_il40_{seed}.log")

    for side in ("ref", "ours"):
        assert osp.exists(_p(side)), (
            f"il40 artifact missing: {_p(side)} — run scripts/parity_15k.py "
            f"{side} --seed {seed} --variant il40")

    ref_final, our_final = _final_mrr(_p("ref")), _final_mrr(_p("ours"))
    assert ref_final is not None and our_final is not None
    assert 0.5 < ref_final < 0.98, f"oracle saturated/broken: {ref_final}"
    assert our_final >= ref_final - 0.035, (our_final, ref_final)

    # eval-by-eval trajectory: "Ep <n> | l2r: ... mrr = X" lines
    traj_re = re.compile(r"Ep (\d+) \| l2r:.*mrr = ([\d.]+)")
    ref_tr = dict((int(e), float(m))
                  for e, m in traj_re.findall(open(_p("ref")).read()))
    our_tr = dict((int(e), float(m))
                  for e, m in traj_re.findall(open(_p("ours")).read()))
    common = sorted(set(ref_tr) & set(our_tr))
    assert len(common) >= 5, (sorted(ref_tr), sorted(our_tr))
    for ep in common[-3:]:
        assert abs(our_tr[ep] - ref_tr[ep]) < 0.06, (ep, our_tr[ep], ref_tr[ep])

    # both sides must show repeated promotion into pool drain-down
    for side in ("ref", "ours"):
        text = open(_p(side)).read()
        assert text.count("new_links_select") >= 3, side
