"""Full eval-protocol dry run: one mixed JSONL covering every task in the
registry (all metric families, every subtask-merge group, every field
alias), scored end-to-end through evaluate_file, pinned against a golden
file.

This is the shape /root/reference/eval/eval.py:832-1058 actually
processes: a single inference dump mixing 22 tasks, subtask names
(pd-prom_300_*, cpd-prom_core_*, tf_m-0..4, tf_h-0..4, auto-collected
emp-* / promoter_enhancer_interaction-* groups), legacy task names that
must be renamed (rna_protein_interaction -> ncRNAProteinInter), 'tf-h'
style substitutions, 'result'/'decoded_output'/'gt_label' field aliases,
and broken lines. Any drift in merging, renaming, dispatch, or metric
math vs the golden fails here.

Regenerate the golden (after an INTENTIONAL protocol change only):
    python tests/test_eval_protocol.py --regen
"""

import json
import os

import numpy as np
import pytest

from molly_tpu.evalsuite.harness import evaluate_file
from molly_tpu.evalsuite.registry import TASK_REGISTRY

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "data",
                           "eval_protocol_golden.json")

RNA_FAMILIES = ["tRNA", "miRNA", "riboswitch", "IRES", "leader", "scaRNA",
                "5S_rRNA", "ribozyme"]
# all 13 modification classes: macro AUC needs every class present in
# y_true at least once or sklearn returns nan for the missing columns
MODS = ["Am", "Cm", "Gm", "Um", "m1A", "m5C", "m5U", "m6A", "m6Am", "m7G",
        "Psi", "AtoI", "none"]
ECS = ["2.7.11.1", "3.1.3.16", "1.1.1.1", "2.7.10.2", "6.3.2.19"]


def _binary_rows(rng, task, n=24, acc=0.8, style="plain"):
    """Binary-classification rows at a target accuracy, exercising the
    keyword / dont-know / sentiment-fallback code paths."""
    rows = []
    for i in range(n):
        label = "positive" if rng.random() < 0.5 else "negative"
        correct = rng.random() < acc
        want_yes = (label == "positive") == correct
        r = rng.random()
        if r < 0.6:
            out = "Yes." if want_yes else "No."
        elif r < 0.75:
            out = ("The answer is yes, it is detected."
                   if want_yes else "It was not detected in this sample.")
        elif r < 0.85:
            # no keyword -> lexicon sentiment fallback path
            out = ("This region is likely active and binds strongly."
                   if want_yes else "This region is inactive and weak.")
        elif r < 0.93:
            out = "I don't know."  # counted wrong regardless
        else:
            out = "Yes" if want_yes else "No"
        row = {"task": task, "label": label}
        if style == "result":
            row["result"] = out
        elif style == "raw":  # raw inference-CLI rows (pre-convert format)
            row["decoded_output"] = out
            row["gt_label"] = row.pop("label")
        else:
            row["model_output"] = out
        rows.append(row)
    return rows


def _regression_rows(rng, task, n=24, noise=0.3, lo=0.0, hi=1.0,
                     invalid_frac=0.1):
    rows = []
    for i in range(n):
        label = float(rng.uniform(lo, hi))
        if rng.random() < invalid_frac:
            out = "I cannot determine the value."  # -> inf, downweighted
        else:
            pred = label + rng.normal(0.0, noise * (hi - lo))
            out = f"The predicted value is {pred:.2f}."
        rows.append({"task": task, "label": round(label, 4),
                     "model_output": out})
    return rows


def build_protocol_jsonl(path: str) -> None:
    rng = np.random.default_rng(20260819)
    rows = []

    # --- DNA binary: merged subtask groups -------------------------------
    for sub in ("pd-prom_300_tata", "pd-prom_300_all", "pd-prom_300_notata"):
        rows += _binary_rows(rng, sub, acc=0.82)
    for sub in ("cpd-prom_core_all", "cpd-prom_core_tata",
                "cpd-prom_core_notata"):
        rows += _binary_rows(rng, sub, acc=0.74, style="result")
    for i in range(5):
        rows += _binary_rows(rng, f"tf_m-{i}", n=16, acc=0.7)
    for i in range(5):
        # 'tf-h-*' exercises the tf-h -> tf_h name substitution
        rows += _binary_rows(rng, f"tf-h-{i}", n=16, acc=0.72)
    # auto-collected prefix groups (emp-*, promoter_enhancer_interaction-*)
    for mark in ("H3K4me1", "H3K36me3", "H4"):
        rows += _binary_rows(rng, f"emp-{mark}", n=16, acc=0.66)
    for cell in ("GM12878", "K562"):
        rows += _binary_rows(rng, f"promoter_enhancer_interaction-{cell}",
                             n=16, acc=0.64)
    rows += _binary_rows(rng, "tf-0", n=20, acc=0.69)  # tf- prefix -> tf

    # --- legacy names that must be renamed at load ----------------------
    rows += _binary_rows(rng, "rna_protein_interaction", n=20, acc=0.71,
                         style="raw")
    rows += _binary_rows(rng, "antibody_antigen", n=20, acc=0.62)

    # --- protein ----------------------------------------------------------
    rows += _binary_rows(rng, "Solubility", n=24, acc=0.77)
    rows += _regression_rows(rng, "Fluorescence", noise=0.25, lo=1.0, hi=4.0)
    rows += _regression_rows(rng, "Stability", noise=0.35, lo=-1.0, hi=2.0)
    rows += _regression_rows(rng, "Thermostability", noise=0.2, lo=30.0,
                             hi=90.0)
    for i in range(20):  # FunctionEC: Fmax over EC-number strings
        true = list(rng.choice(ECS, size=rng.integers(1, 3), replace=False))
        if rng.random() < 0.7:
            pred = list(true)
            if rng.random() < 0.4:
                pred.append(str(rng.choice(ECS)))
        else:
            pred = [str(rng.choice(ECS))]
        rows.append({"task": "FunctionEC", "label": "; ".join(true),
                     "model_output": "The enzyme catalyzes EC "
                                     + " and ".join(pred)})

    # --- RNA ---------------------------------------------------------------
    rows += _regression_rows(rng, "Isoform", noise=0.3, lo=0.0, hi=100.0)
    rows += _regression_rows(rng, "MeanRibosomeLoading", noise=0.25,
                             lo=2.0, hi=9.0)
    rows += _regression_rows(rng, "CRISPROnTarget", noise=0.3, lo=0.0,
                             hi=1.0)
    for i in range(24):  # 13-way family accuracy
        true = str(rng.choice(RNA_FAMILIES))
        pred = true if rng.random() < 0.65 else str(rng.choice(RNA_FAMILIES))
        rows.append({"task": "NoncodingRNAFamily", "label": true,
                     "model_output": f"This sequence is a {pred} family "
                                     "member."})
    for i in range(40):  # multilabel modification AUC (incl 'none' fallback)
        if i < len(MODS) - 1:
            true = [MODS[i]]  # every class appears in y_true at least once
        elif rng.random() < 0.8:
            true = list(rng.choice(MODS[:-1], size=rng.integers(1, 3),
                                   replace=False))
        else:
            true = ["none"]
        if rng.random() < 0.7:
            pred_txt = ", ".join(true) if true != ["none"] else \
                "No modification detected."
        else:
            pred_txt = str(rng.choice(MODS[:-1]))
        rows.append({"task": "Modification", "label": ",".join(true),
                     "model_output": f"Detected: {pred_txt}"})
    for i in range(20):  # 3-output R2 (ON/OFF/ON_OFF)
        on, off = rng.uniform(0, 1), rng.uniform(0, 1)
        lab = {"ON": round(on, 3), "OFF": round(off, 3),
               "ON_OFF": round(on - off, 3)}
        if rng.random() < 0.12:
            out = "ON and OFF states unknown"  # wrong arity -> all-nan row
        else:
            p = [on + rng.normal(0, 0.15), off + rng.normal(0, 0.15),
                 (on - off) + rng.normal(0, 0.15)]
            out = (f"ON: {p[0]:.2f}, OFF: {p[1]:.2f}, ON/OFF: {p[2]:.2f}")
        rows.append({"task": "ProgrammableRNASwitches",
                     "label": json.dumps(lab), "model_output": out})

    # --- multi-omics -------------------------------------------------------
    for i in range(20):  # 2-output PCC (hk/dev enhancer activity)
        hk, dev = rng.uniform(-1, 3), rng.uniform(-1, 3)
        if rng.random() < 0.1:
            out = "unable to estimate"
        else:
            out = (f"Housekeeping: {hk + rng.normal(0, 0.4):.2f}, "
                   f"Developmental: {dev + rng.normal(0, 0.4):.2f}")
        rows.append({"task": "enhancer_activity",
                     "label": json.dumps({"hk": round(hk, 3),
                                          "dev": round(dev, 3)}),
                     "model_output": out})
    # siRNA mixed score (MAE/range-MAE/F1 blend, threshold 30)
    for i in range(24):
        label = float(rng.uniform(0, 100))
        if rng.random() < 0.08:
            out = f"around {rng.uniform(2e3, 5e3):.0f}"  # too-large -> 0
        else:
            out = f"{np.clip(label + rng.normal(0, 12), 0, 100):.2f}"
        rows.append({"task": "sirnaEfficiency", "label": round(label, 2),
                     "model_output": out})

    # --- malformed rows the loader must skip ------------------------------
    lines = [json.dumps(r) for r in rows]
    lines.insert(7, "this is not json {")
    lines.insert(23, json.dumps(["a", "list", "not", "a", "dict"]))
    lines.insert(41, "")
    # nan-label row: dropped at grouping
    lines.append(json.dumps({"task": "pd-prom_300_all", "label": None,
                             "model_output": "Yes."}))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


EXPECTED_TASKS = {
    # merged groups + their subtasks all appear in the output
    # NOTE: no merged "tf" group — the reference merges only pd/cpd/tf_m/
    # tf_h/emp/promoter_enhancer_interaction (eval.py:887-944); tf-* scores
    # standalone with base-task dispatch.
    "DNA": {"pd", "cpd", "tf_m", "tf_h", "emp",
            "pd-prom_300_tata", "pd-prom_300_all", "pd-prom_300_notata",
            "cpd-prom_core_all", "cpd-prom_core_tata",
            "cpd-prom_core_notata",
            *{f"tf_m-{i}" for i in range(5)},
            *{f"tf_h-{i}" for i in range(5)},
            "emp-H3K4me1", "emp-H3K36me3", "emp-H4", "tf-0",
            "enhancer_activity"},
    "Protein": {"Solubility", "Fluorescence", "Stability",
                "Thermostability", "FunctionEC"},
    "RNA": {"Isoform", "MeanRibosomeLoading", "CRISPROnTarget",
            "NoncodingRNAFamily", "Modification",
            "ProgrammableRNASwitches"},
    "Multi": {"ncRNAProteinInter", "AntibodyAntigen", "sirnaEfficiency",
              "promoter_enhancer_interaction",
              "promoter_enhancer_interaction-GM12878",
              "promoter_enhancer_interaction-K562"},
}


def _run(tmp_path):
    jsonl = str(tmp_path / "mixed_inference.jsonl")
    build_protocol_jsonl(jsonl)
    return evaluate_file(jsonl)


def test_protocol_covers_every_registry_task(tmp_path):
    got = _run(tmp_path)
    for omics, tasks in EXPECTED_TASKS.items():
        assert tasks <= set(got.get(omics, {})), (
            omics, tasks - set(got.get(omics, {})))
    # every registry base task is represented (post-rename names)
    scored = {t for ts in got.values() for t in ts}
    for base in TASK_REGISTRY:
        if base in ("rna_protein_interaction", "antibody_antigen"):
            continue  # legacy input names; scored under their renames
        assert base in scored or any(t.startswith(base + "-")
                                     for t in scored), base


def test_protocol_matches_golden(tmp_path):
    got = _run(tmp_path)
    if not os.path.exists(GOLDEN_PATH):
        pytest.fail(f"golden file missing: {GOLDEN_PATH} — regenerate with "
                    "python tests/test_eval_protocol.py --regen")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert json.loads(json.dumps(got)) == golden


if __name__ == "__main__":
    import sys
    import tempfile

    if "--regen" in sys.argv:
        with tempfile.TemporaryDirectory() as d:
            jsonl = os.path.join(d, "mixed_inference.jsonl")
            build_protocol_jsonl(jsonl)
            result = evaluate_file(jsonl)
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(json.loads(json.dumps(result)), f, indent=2,
                      sort_keys=True)
        print(f"golden written: {GOLDEN_PATH}")
    else:
        print(__doc__)
