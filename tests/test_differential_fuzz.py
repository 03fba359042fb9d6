"""Randomized differential testing: hypothesis-generated corpora vs
the DuckDB oracle, with shrinking.

The three adversarial corpora are hand-designed; this closes the gap
they can't — inputs nobody thought to write down. Each example
materializes a random documents+events corpus as parquet (texts drawn
from an alphabet heavy in the characters that break naive query
twins: regex metacharacters for the tokenizer/fingerprint paths,
LIKE wildcards, quotes and backslashes for the JSON path, multibyte
unicode for length semantics, runs of spaces for split edges) and
replays the full engine-vs-oracle comparison for a fast cross-family
query subset. A failure shrinks to a minimal corpus.

Examples are few (parquet write + ~9 queries each); the suite stays
in the tens of seconds. The hand corpora remain the broad gate; this
is the probe for the unknown unknowns.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings, strategies as st

from big_data_backblaze_hard_drive_failure_spark.plans import ORACLE, QUERIES
from tests.oracle import compare

# regex metachars, LIKE wildcards, quotes/backslash, unicode, spaces
_ALPHABET = 'ab .*\\"\'é😀0$%_-'

_text = st.text(alphabet=_ALPHABET, min_size=0, max_size=40)

_docs = st.lists(
    st.tuples(
        _text,
        st.sampled_from(["en", "de", "xx"]),
        st.sampled_from(["src0", "src1"]),
    ),
    min_size=1,
    max_size=12,
)

_TS0 = dt.datetime(2024, 1, 1)
# ten candidate instants -> tie-heavy by construction
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),      # ts slot
        st.integers(min_value=0, max_value=3),      # user
        st.sampled_from(
            ["error", "click", "view", "signup", "purchase"]
        ),
        st.integers(min_value=-999, max_value=9999),  # cents
        st.sampled_from(
            ['{"k": 1}', "{}", "not json", "", '{"k": -7}', '{"k": "x"}']
        ),
    ),
    min_size=1,
    max_size=20,
)

# fast, table-local, cross-family: text stats / dedup / fingerprints /
# regex tokenizer / string scalars on documents; windows / daily agg /
# JSON on events
_DOC_QUERIES = [
    "datapipe_text_stats",
    "datapipe_exact_dedup",
    "datapipe_doc_fingerprint",
    "datapipe_token_count_regex",
    "datapipe_lang_id",
    # round-8 rewrite ops: chunk-grid arithmetic + window survivorship
    # + ordered reassembly are exactly what fuzz corpora stress
    # (regex metachars inside tokens, multibyte unicode, space runs)
    "datapipe_paragraph_dedup",
    "datapipe_cdc_chunk_dedup",
    "datapipe_span_corruption",
    "datapipe_feature_hashing",
    # round-9: A-ES ranking under degenerate weights (n_chars 0/short)
    # and tiny strata
    "datapipe_weighted_sample_stratified",
    # slice clamping + chunk-count arithmetic on boundary-length docs
    "datapipe_doc_chunking",
]
_EVENT_QUERIES = [
    "ref_label_lead",
    "ref_alerts_daily",
    "ref_when_otherwise",
    "datapipe_props_json",
    # round-8: agreement/test statistics (exact integer ratios) and
    # the struct-key sequence-pattern join under tie-heavy timestamps
    "mlops_cohens_kappa",
    "mlops_mcnemar_test",
    "star_sequential_pattern",
    "star_decayed_recency_agg",
    # round-9: the two-level as-of hand-off under tie-heavy
    # (stratum, score) and empty treated/control sides; session
    # merges on exactly-equal timestamps
    "mlops_propensity_match",
    "ref_session_funnel",
    # WoE under degenerate classes (all-good / all-bad / empty bins —
    # DuckDB ln(0) aborts where Spark NULLs; NULLIF guards pinned)
    "mlops_woe_binning",
]


def _write(dirpath: str, name: str, cols: dict, src_schema_of: str):
    schema = pq.read_schema(
        os.path.join(
            os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001"),
            f"{src_schema_of}.parquet",
        )
    )
    schema = pa.schema([schema.field(i) for i in range(len(schema))])
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in schema],
            schema=schema,
        ),
        os.path.join(dirpath, f"{name}.parquet"),
    )


_SETTINGS = dict(
    # 6 examples in-suite; deep runs override via env (round-7/8
    # convention: a 40-example pass before each round closes)
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "6")),
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


@given(docs=_docs)
@settings(**_SETTINGS)
def test_document_queries_match_oracle_on_random_corpus(
    spark, tmp_path_factory, docs
):
    d = str(tmp_path_factory.mktemp("fuzz_docs"))
    _write(
        d,
        "documents",
        {
            "doc_id": list(range(len(docs))),
            "text": [t for t, _, _ in docs],
            "lang": [la for _, la, _ in docs],
            "source": [s for _, _, s in docs],
            "n_chars": [len(t) for t, _, _ in docs],
        },
        "documents",
    )
    for name in _DOC_QUERIES:
        compare(spark, d, QUERIES[name], ORACLE[name])


@given(events=_events)
@settings(**_SETTINGS)
def test_event_queries_match_oracle_on_random_corpus(
    spark, tmp_path_factory, events
):
    d = str(tmp_path_factory.mktemp("fuzz_events"))
    _write(
        d,
        "events",
        {
            "event_id": list(range(len(events))),
            "ts": [
                _TS0 + dt.timedelta(hours=7 * slot)
                for slot, *_ in events
            ],
            "user_id": [u for _, u, *_ in events],
            "event_type": [t for _, _, t, *_ in events],
            "value": [c / 100.0 for *_, c, _ in events],
            "props": [p for *_, p in events],
        },
        "events",
    )
    for name in _EVENT_QUERIES:
        compare(spark, d, QUERIES[name], ORACLE[name])
