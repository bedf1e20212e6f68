"""OpenAIBatchClassifier: the reference's Batch API flow
(json_classification.py:95-217) against a fake transport — request
JSONL shape, chunked submission, polling, bounded retries, and the
K3/K4 audit writes whose fixtures MockReplayClassifier replays.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from oculus_data_pipeline_spark.operators.classify import (
    BATCH_SYSTEM_PROMPT,
    MockReplayClassifier,
    OpenAIBatchClassifier,
)

from .ref_model import echo_label


def _response_line(custom_id: str, label: str) -> str:
    # OpenAI batch result JSONL shape (json_classification.py:205-212)
    return json.dumps(
        {
            "custom_id": custom_id,
            "response": {
                "body": {
                    "choices": [
                        {
                            "message": {
                                "content": json.dumps(
                                    {"classification": label.upper()}
                                )
                            }
                        }
                    ]
                }
            },
        }
    )


class FakeTransport:
    """Labels each term deterministically (echo_label); optionally
    fails the first ``flaky`` calls of every method."""

    def __init__(self, flaky: int = 0, final_status: str = "completed",
                 pending_polls: int = 1):
        self.files: dict[str, bytes] = {}
        self.batches: dict[str, dict] = {}
        self.calls: list[str] = []
        self.flaky = flaky
        self.final_status = final_status
        self.pending_polls = pending_polls
        self._fails: dict[str, int] = {}

    def _maybe_fail(self, op: str) -> None:
        self.calls.append(op)
        n = self._fails.get(op, 0)
        if n < self.flaky:
            self._fails[op] = n + 1
            raise ConnectionError(f"transient {op} failure {n}")

    def upload_file(self, content: bytes) -> str:
        self._maybe_fail("upload_file")
        fid = f"file-{len(self.files)}"
        self.files[fid] = content
        return fid

    def create_batch(self, input_file_id: str) -> str:
        self._maybe_fail("create_batch")
        bid = f"batch-{len(self.batches)}"
        self.batches[bid] = {"input": input_file_id, "polls": 0}
        return bid

    def get_batch(self, batch_id: str):
        self._maybe_fail("get_batch")
        b = self.batches[batch_id]
        b["polls"] += 1
        if b["polls"] <= self.pending_polls:
            return "in_progress", None
        if self.final_status != "completed":
            return self.final_status, None
        lines = []
        for line in self.files[b["input"]].decode().splitlines():
            task = json.loads(line)
            term = task["body"]["messages"][1]["content"]
            lines.append(_response_line(task["custom_id"], echo_label(term)))
        out_id = f"file-out-{batch_id}"
        self.files[out_id] = ("\n".join(lines) + "\n").encode()
        return "completed", out_id

    def download_file(self, file_id: str) -> bytes:
        self._maybe_fail("download_file")
        return self.files[file_id]


TERMS = ["george washington", "mount vernon", "continental army",
         "some treaty", "delaware river"]


def _terms_df(spark):
    return spark.createDataFrame([(t,) for t in TERMS], ["norm_term"])


def test_batch_flow_labels_and_request_shape(spark, tmp_path):
    transport = FakeTransport()
    clf = OpenAIBatchClassifier(
        transport=transport, audit_dir=str(tmp_path), sleep=lambda s: None
    )
    got = {r["norm_term"]: r["label"] for r in clf.classify(_terms_df(spark)).collect()}
    assert got == {t: echo_label(t) for t in TERMS}

    # request JSONL is the reference task shape (json_classification.py:126-148)
    tasks = [json.loads(l) for l in transport.files["file-0"].decode().splitlines()]
    ids = {t["custom_id"] for t in tasks}
    assert ids == {f"task-{i}" for i in range(len(TERMS))}
    for t in tasks:
        assert t["method"] == "POST" and t["url"] == "/v1/chat/completions"
        body = t["body"]
        assert body["response_format"] == {"type": "json_object"}
        assert body["messages"][0] == {"role": "system", "content": BATCH_SYSTEM_PROMPT}
        assert body["messages"][1]["role"] == "user"
        assert body["messages"][1]["content"] in TERMS


def test_audit_files_replayable_by_mock_classifier(spark, tmp_path):
    """K3/K4: the audit JSONLs are the reference's test_mode fixture
    format — MockReplayClassifier must replay them to identical labels."""
    clf = OpenAIBatchClassifier(
        transport=FakeTransport(), audit_dir=str(tmp_path), sleep=lambda s: None
    )
    direct = {r["norm_term"]: r["label"] for r in clf.classify(_terms_df(spark)).collect()}

    replay = MockReplayClassifier(
        str(tmp_path / "batch_tasks_batch.jsonl"),
        str(tmp_path / "batch_results_batch.jsonl"),
    )
    replayed = {
        r["norm_term"]: r["label"] for r in replay.classify(_terms_df(spark)).collect()
    }
    assert replayed == direct


def test_chunked_submission_global_custom_ids(spark):
    transport = FakeTransport()
    clf = OpenAIBatchClassifier(
        transport=transport, max_requests_per_batch=2, sleep=lambda s: None
    )
    got = {r["norm_term"]: r["label"] for r in clf.classify(_terms_df(spark)).collect()}
    assert got == {t: echo_label(t) for t in TERMS}
    assert len(transport.batches) == 3  # 2 + 2 + 1
    all_ids = [
        json.loads(l)["custom_id"]
        for fid in ("file-0", "file-1", "file-2")
        for l in transport.files[fid].decode().splitlines()
    ]
    assert all_ids == [f"task-{i}" for i in range(len(TERMS))]  # global indexing


def test_transient_errors_retry_with_backoff(spark):
    sleeps: list[float] = []
    transport = FakeTransport(flaky=2)
    clf = OpenAIBatchClassifier(
        transport=transport, max_retries=3, sleep=sleeps.append
    )
    got = {r["norm_term"]: r["label"] for r in clf.classify(_terms_df(spark)).collect()}
    assert got == {t: echo_label(t) for t in TERMS}
    assert sleeps[:2] == [1.0, 2.0]  # exponential backoff on upload_file


def test_retries_exhausted_raises(spark):
    transport = FakeTransport(flaky=10)
    clf = OpenAIBatchClassifier(transport=transport, max_retries=2, sleep=lambda s: None)
    with pytest.raises(ConnectionError):
        clf.classify(_terms_df(spark)).collect()


def test_failed_batch_raises(spark):
    transport = FakeTransport(final_status="failed")
    clf = OpenAIBatchClassifier(transport=transport, sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="failed"):
        clf.classify(_terms_df(spark)).collect()
