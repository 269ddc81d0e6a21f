"""CoT generation client: transport injection, <think> extraction,
thread-pool fan-out, resume-by-id (reference data_tools/openai_api.py)."""

import json

import pandas as pd

from molly_tpu.tools.cot_gen import (
    chat_completion,
    process_dataframe,
    read_existing_ids,
)


def fake_transport(url, payload):
    req = json.loads(payload)
    prompt = req["messages"][-1]["content"]
    return {
        "choices": [{"message": {
            "content": f"<think>because {prompt}</think>\nAnswer: yes"}}],
        "usage": {"completion_tokens": 7},
    }


def r1_transport(url, payload):
    return {
        "choices": [{"message": {"content": "Answer: no",
                                 "reasoning_content": "deep thought"}}],
        "usage": {"completion_tokens": 3},
    }


def test_chat_completion_think_extraction():
    out = chat_completion("http://x/v1", "m", "q1", transport=fake_transport)
    assert out["reasoning"] == "because q1"
    assert out["content"] == "Answer: yes"
    assert out["completion_tokens"] == 7


def test_chat_completion_r1_field():
    out = chat_completion("http://x/v1", "m", "q", transport=r1_transport)
    assert out["reasoning"] == "deep thought"
    assert out["content"] == "Answer: no"


def test_process_and_resume(tmp_path):
    df = pd.DataFrame([{"task": f"t{i}", "input": f"q{i}"}
                       for i in range(6)])
    out = str(tmp_path / "cot.jsonl")
    stats = process_dataframe(df, out, base_url="http://x/v1", model="m",
                              workers=3, transport=fake_transport,
                              progress_every=0)
    assert stats == {"done": 6, "skipped": 0, "failed": 0}
    rows = [json.loads(l) for l in open(out)]
    assert {r["id"] for r in rows} == set(range(6))
    assert all(r["think"].startswith("because") for r in rows)
    # resume: nothing re-queried
    stats2 = process_dataframe(df, out, base_url="http://x/v1", model="m",
                               workers=3, transport=fake_transport,
                               progress_every=0)
    assert stats2 == {"done": 0, "skipped": 6, "failed": 0}
    assert len(read_existing_ids(out)) == 6
    assert len(open(out).readlines()) == 6


def test_failed_rows_counted_not_written(tmp_path):
    calls = []

    def flaky(url, payload):
        calls.append(1)
        raise ConnectionError("boom")

    df = pd.DataFrame([{"task": "t", "input": "q"}])
    out = str(tmp_path / "cot.jsonl")
    stats = process_dataframe(df, out, base_url="http://x/v1", model="m",
                              workers=1, max_retries=2, transport=flaky,
                              progress_every=0)
    assert stats["failed"] == 1 and len(calls) == 2
    assert read_existing_ids(out) == set()


def test_rephrase_mode_grounds_label(tmp_path):
    systems = []

    def capture(url, payload):
        systems.append(json.loads(payload)["messages"][0]["content"])
        return {"choices": [{"message": {"content": "rephrased"}}],
                "usage": {}}

    df = pd.DataFrame([{"task": "t", "input": "q", "label": "GOLD"}])
    out = str(tmp_path / "re.jsonl")
    stats = process_dataframe(df, out, base_url="http://x/v1", model="m",
                              workers=1, transport=capture,
                              progress_every=0, rephrase=True)
    assert stats["done"] == 1
    assert "bioinformatics" in systems[0]
    assert "GOLD" in systems[0]
