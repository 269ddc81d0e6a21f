"""Eval harness tests with synthetic JSONL (SURVEY.md §4 strategy)."""

import json

import numpy as np
import pytest

from molly_tpu.evalsuite import (
    evaluate_file,
    get_base_task_name,
    group_entries,
    metrics as M,
)


def test_extract_numeric_values():
    assert M.extract_numeric_values("value is 3.14 and -2") == [3.14, -2.0]
    assert M.extract_numeric_values("2.000000") == [2.0]
    assert M.extract_numeric_values("no numbers") == []


def test_classify_by_keywords():
    assert M.classify_by_keywords("Yes, it binds") == 1
    assert M.classify_by_keywords("There is no evidence") == 0
    assert M.classify_by_keywords("I am unsure about this") == "dont_know"
    assert M.classify_by_keywords("banana") is None


def test_spearman_downweighting():
    # half the outputs unparseable (inf) -> score halves
    labels = [1, 2, 3, 4]
    results = [1, 2, float("inf"), float("inf")]
    s = M.compute_spearman(labels, results)["spearman"]
    assert abs(s - 0.5) < 1e-9  # perfect rho on the valid half * 2/4


def test_r2_is_squared_pcc():
    labels = [1.0, 2.0, 3.0, 4.0]
    results = [2.0, 4.0, 6.0, 8.0]
    assert abs(M.compute_r2(labels, results)["R2"] - 1.0) < 1e-9


def test_mcc_and_acc():
    labels = [1, 0, 1, 0]
    preds = [1, 0, 1, 1]
    assert M.compute_acc(labels, preds)["Acc"] == 0.75
    assert 0 < M.compute_mcc(labels, preds)["MCC"] < 1


def test_binary_outcomes_fallbacks():
    entries = [
        {"label": "positive", "model_output": "Yes."},
        {"label": "negative", "model_output": "not detected"},
        {"label": "positive", "model_output": "I am unsure"},  # wrong
        {"label": "positive", "model_output": None},           # wrong
    ]
    labels, preds = M.binary_outcomes(entries)
    assert labels == [1, 0, 1, 1]
    assert preds == [1, 0, 0, 0]


def test_rna_family_and_modifications():
    assert M.extract_rna_family("this is a riboswitch element") == \
        "riboswitch"
    # longest-first: 5_8S_rRNA should win over 5S_rRNA when present
    assert M.extract_rna_family("contains 5_8S_rRNA") == "5_8S_rRNA"
    assert M.extract_modifications("m6A and Psi sites") == ["m6A", "Psi"]
    assert M.extract_modifications("m6Am only") == ["m6Am"]  # word boundary


def test_fmax_perfect_and_partial():
    target = np.array([[1, 0, 1], [0, 1, 0]], dtype=float)
    assert M.fmax(target.copy(), target) == pytest.approx(1.0)
    pred = np.array([[1, 1, 0], [0, 1, 0]], dtype=float)
    v = M.fmax(pred, target)
    assert 0 < v < 1.0


def test_programmable_rna_switches():
    entries = [
        {"label": json.dumps({"ON": 1.0, "OFF": 2.0, "ON_OFF": 0.5}),
         "model_output": "1.1, 2.1, 0.6", "input": ""},
        {"label": json.dumps({"ON": 2.0, "OFF": 1.0, "ON_OFF": 2.0}),
         "model_output": "2.2, 1.2, 2.2", "input": ""},
        {"label": json.dumps({"ON": 3.0, "OFF": 4.0, "ON_OFF": 0.7}),
         "model_output": "2.9, 3.9, 0.8", "input": ""},
    ]
    r2 = M.compute_r2_programmable_rna_switches(entries)["R2"]
    assert 0.9 < r2 <= 1.0


def test_enhancer_activity_pcc():
    entries = [
        {"label": json.dumps({"hk": 1.0, "dev": 5.0}),
         "model_output": "1.2 4.9", "input": ""},
        {"label": json.dumps({"hk": 2.0, "dev": 4.0}),
         "model_output": "2.1 4.1", "input": ""},
        {"label": json.dumps({"hk": 3.0, "dev": 3.0}),
         "model_output": "2.9 3.1", "input": ""},
    ]
    pcc = M.compute_pcc_enhancer_activity(entries)["PCC"]
    assert pcc["hk_PCC"] > 0.99 and pcc["dev_PCC"] > 0.99


def test_group_entries_merging_and_renames():
    entries = []
    for i, sub in enumerate(["tf-m-0", "tf-m-1"]):
        for j in range(2):
            entries.append({"task": sub, "label": "positive",
                            "result": "yes", "input": f"x{i}{j}"})
    entries.append({"task": "rna_protein_interaction", "label": "negative",
                    "model_output": "no", "input": "y"})
    entries.append({"task": "emp-H3K4me3", "label": "positive",
                    "model_output": "yes", "input": "z"})
    groups = group_entries(entries)
    assert set(groups) >= {"tf_m-0", "tf_m-1", "tf_m", "ncRNAProteinInter",
                           "emp-H3K4me3", "emp"}
    assert len(groups["tf_m"]) == 4
    # 'result' renamed to model_output
    assert groups["tf_m"][0]["model_output"] == "yes"


def test_get_base_task_name():
    assert get_base_task_name("pd-prom_300_tata") == "pd"
    assert get_base_task_name("tf_h-3") == "tf_h"
    assert get_base_task_name("Fluorescence-Fluorescence") == "Fluorescence"
    with pytest.raises(KeyError):
        get_base_task_name("not_a_task")


def test_evaluate_file_end_to_end(tmp_path):
    rows = []
    # binary MCC task (pd subtask)
    for i in range(6):
        rows.append({"task": "pd-prom_300_tata",
                     "label": "positive" if i % 2 else "negative",
                     "result": "Yes" if i % 2 else "No", "input": f"i{i}",
                     "kind": "dna"})
    # regression spearman (Stability)
    for i in range(5):
        rows.append({"task": "Stability-Stability", "label": str(i * 1.0),
                     "result": f"The value is {i}.0", "input": f"s{i}",
                     "kind": "protein"})
    # ncRNA family
    rows.append({"task": "NoncodingRNAFamily-NoncodingRNAFamily",
                 "label": "tRNA", "result": "This is tRNA", "input": "r",
                 "kind": "rna"})
    p = tmp_path / "inf.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    out = evaluate_file(str(p))
    assert out["DNA"]["pd-prom_300_tata"]["MCC"] == 100.0
    assert out["DNA"]["pd"]["MCC"] == 100.0  # merged group too
    assert out["Protein"]["Stability-Stability"]["spearman"] == 100.0
    assert out["RNA"]["NoncodingRNAFamily-NoncodingRNAFamily"]["Acc"] == 100.0
