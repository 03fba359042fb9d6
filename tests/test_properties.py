"""Property-based tests (hypothesis): operator semantics verified
against plain-Python reference implementations on generated data —
coverage the fixture-based oracle can't give (degenerate groups,
ties, single-element entities, empty inputs).

Settings: few examples with reuse of one SparkSession; each example
is a tiny local DataFrame, so the suite stays fast.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from big_data_backblaze_hard_drive_failure_spark.operators.labeling import (
    lead_label,
)
from big_data_backblaze_hard_drive_failure_spark.operators.topk import (
    top_k_per_group,
)

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # group
        st.integers(min_value=0, max_value=50),  # value
        st.integers(min_value=0, max_value=99),  # unique-ish id
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[2],
)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=_rows, k=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_top_k_per_group_property(spark, rows, k):
    df = spark.createDataFrame(rows, "g INT, v INT, id INT")
    got = {
        (r["g"], r["id"])
        for r in top_k_per_group(
            df, ["g"], [F.col("v").desc(), F.col("id")], k=k
        ).collect()
    }
    groups = defaultdict(list)
    for g, v, i in rows:
        groups[g].append((-v, i))
    want = {
        (g, i)
        for g, vals in groups.items()
        for (_, i) in sorted(vals)[:k]
    }
    assert got == want


@given(rows=_rows)
@settings(**_SETTINGS)
def test_lead_label_property(spark, rows):
    """Label is 1 iff the entity's NEXT row (by (v, id) order) has
    flag 1; last row per entity is always 0."""
    data = [(g, v, i, i % 2) for g, v, i in rows]
    df = spark.createDataFrame(data, "g INT, v INT, id INT, flag INT")
    got = {
        r["id"]: r["failure_next_24h"]
        for r in lead_label(df, "g", ["v", "id"], "flag").collect()
    }
    groups = defaultdict(list)
    for g, v, i, f in data:
        groups[g].append((v, i, f))
    want = {}
    for g, vals in groups.items():
        vals.sort()
        for idx, (_, i, _f) in enumerate(vals):
            nxt = vals[idx + 1][2] if idx + 1 < len(vals) else 0
            want[i] = 1 if nxt == 1 else 0
    assert got == want


def test_one_round_clustering_diverges_on_chains(spark, tmp_path):
    """datapipe_neardup_clusters is ONE round of star contraction;
    datapipe_neardup_components is the fixpoint. On a dup graph of
    diameter > 1 they MUST diverge exactly as documented — protecting
    users from treating the cheap single pass as a full transitive
    dedup.

    Constructed chain: three docs A(1), B(2), C(3) over a shared base
    token set, where A adds a token that wins the band-1 minhashes
    only, and C adds one that wins band-0 only:
      * A and B collide in band 0, B and C collide in band 1,
        A and C collide nowhere  ->  path A - B - C, diameter 2.
    One round: doc 3's bucket reps are {3 (band 0), 2 (band 1)} so it
    contracts to 2 — which is itself NOT a representative (2 -> 1).
    The fixpoint pulls all three to component 1.
    (Chain tokens found by direct md5 search over the engine's salted
    minhash — see functions/hashing.py DEFAULT_SALTS.)
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_backblaze_hard_drive_failure_spark.plans import QUERIES

    base = "alpha beta gamma delta epsilon zeta"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [base + " w109", base, base + " w427"],
            "lang": ["en"] * 3,
            "source": ["synthetic"] * 3,
            "n_chars": [len(base) + 5, len(base), len(base) + 5],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    sf = str(tmp_path)

    one_round = {
        r["doc_id"]: r["rep_id"]
        for r in QUERIES["datapipe_neardup_clusters"](spark, sf).collect()
    }
    fixpoint = {
        r["doc_id"]: r["component_id"]
        for r in QUERIES["datapipe_neardup_components"](spark, sf).collect()
    }
    # the single pass leaves doc 3 pointing at 2 (a non-representative)
    assert one_round == {1: 1, 2: 1, 3: 2}
    # the fixpoint contracts the whole chain
    assert fixpoint == {1: 1, 2: 1, 3: 1}
    assert one_round != fixpoint


@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=4), min_size=0, max_size=8
    )
)
@settings(**_SETTINGS)
def test_ngram_shingles_property(spark, words):
    """For ANY token list: len(shingles) == max(0, n_tokens - 2) for
    trigram shingles, each shingle is 3 space-joined consecutive
    tokens, and short docs yield [] (never a runtime crash)."""
    from big_data_backblaze_hard_drive_failure_spark.functions.text import (
        ngram_shingles,
    )

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], ["text"])
    [row] = df.select(ngram_shingles("text", 3).alias("sh")).collect()
    toks = text.split(" ") if text else [""]
    want = [
        " ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))
    ]
    assert row["sh"] == want


def test_countmin_merge_and_bound(spark):
    """CM sketch invariants on a skewed synthetic key stream:
    (1) guarantee: estimate >= exact count for EVERY key;
    (2) mergeability: grid(all) == cellwise-sum(grid(slice A),
        grid(slice B)) for any disjoint split — the property that
        makes the sketch a one-pass, recombinable 100 TB aggregate.
    """
    from big_data_backblaze_hard_drive_failure_spark.plans.datapipe import (
        _CM_D,
        _CM_W,
        cm_sketch,
    )

    hex_digits = (_CM_W - 1).bit_length() // 4  # bucket width in hex chars

    # Zipf-ish: key k appears ~200/(k+1) times.
    rows = [(k,) for k in range(40) for _ in range(200 // (k + 1))]
    ev = spark.createDataFrame(rows, "user_id INT").select(
        "user_id", F.col("user_id").cast("string").alias("u")
    )
    grid = {
        (r["r"], r["bucket"]): r["cnt"] for r in cm_sketch(ev).collect()
    }

    # (1) estimate >= exact for every key
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    # probe cells recomputed in plain Python (hashlib.md5) — also
    # cross-checks the portable instr-hex SQL against a second impl
    import hashlib

    def cells(key: int) -> list[tuple[int, int]]:
        return [
            (
                i,
                int(
                    hashlib.md5(f"cm{i}|{key}".encode()).hexdigest()[
                        :hex_digits
                    ],
                    16,
                ),
            )
            for i in range(_CM_D)
        ]

    for key, n in exact.items():
        est = min(grid[c] for c in cells(key))
        assert est >= n, (key, est, n)

    # (2) cell-wise merge of two disjoint slices == full grid
    a = ev.filter(F.col("user_id") % 2 == 0)
    b = ev.filter(F.col("user_id") % 2 == 1)
    merged = defaultdict(int)
    for part in (a, b):
        for r in cm_sketch(part).collect():
            merged[(r["r"], r["bucket"])] += r["cnt"]
    assert dict(merged) == grid


@given(
    st.integers(min_value=4, max_value=12),
    st.integers(min_value=4, max_value=10),
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=40, deadline=None)
def test_average_hash_properties(w, h, seed, shift):
    """Two structural invariants of the perceptual hash: (1) a
    uniform additive brightness shift never changes any bit (the
    mean shifts identically), and (2) hashing equals hashing the
    4x4 nearest-neighbor thumbnail — the hash IS the thumbnail
    signature (floor-lattice composition)."""
    import random

    from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
        average_hash,
        resize_nearest,
    )

    rng = random.Random(seed)
    # headroom so the +shift can't overflow a byte
    rgb = bytes(rng.randrange(0, 200) for _ in range(w * h * 3))
    base = average_hash(w, h, rgb)

    shifted = bytes(b + shift for b in rgb)
    assert average_hash(w, h, shifted) == base

    thumb = resize_nearest(w, h, rgb, 4, 4)
    assert average_hash(4, 4, thumb) == base


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # order key
            st.integers(min_value=-50, max_value=50),      # value a
            st.integers(min_value=0, max_value=7),         # value b
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    nparts=st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_global_prefix_sums_property(spark, rows, nparts):
    """The distributed two-level prefix sum must equal the plain-Python
    running total for BOTH columns of a shared pass, on any unique-key
    frame and any partition count (1 partition = degenerate case where
    offsets are all zero; more partitions than rows = empty ranges)."""
    from big_data_backblaze_hard_drive_failure_spark.operators.prefix import (
        global_prefix_sums,
    )

    df = spark.createDataFrame(rows, "k INT, a INT, b INT")
    got = {
        r["k"]: (r["ra"], r["rb"])
        for r in global_prefix_sums(
            df, ["k"], {"ra": "a", "rb": "b"}, n_partitions=nparts
        ).collect()
    }
    ra = rb = 0
    want = {}
    for k, a, b in sorted(rows):
        ra += a
        rb += b
        want[k] = (ra, rb)
    assert got == want


@given(
    n_writes=st.integers(min_value=1, max_value=4),
    replay_at=st.integers(min_value=0, max_value=3),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_snapshot_txn_replay_property(spark, tmp_path_factory,
                                      n_writes, replay_at):
    """Any prefix of batch ids replayed against the txn ledger commits
    each id exactly once: after n_writes sequential batches plus one
    replay of an arbitrary earlier id, the version count equals
    n_writes and every committed version is readable."""
    from big_data_backblaze_hard_drive_failure_spark.sources.sinks import (
        read_snapshot,
        read_snapshot_version,
        write_snapshot,
    )

    tdir = str(tmp_path_factory.mktemp("snapprop") / "t")
    df = spark.range(5).toDF("id")
    for b in range(n_writes):
        assert write_snapshot(df, tdir, "app", b) == b + 1
    replay = min(replay_at, n_writes - 1)
    assert write_snapshot(df, tdir, "app", replay) == 0
    assert read_snapshot_version(tdir) == n_writes
    for v in range(1, n_writes + 1):
        assert read_snapshot(spark, tdir, version=v).count() == 5


# --------------------------------------------------------------------
# Round-6 reporting boundary: PNG codec identity and show_string parity
# on generated inputs.
# --------------------------------------------------------------------
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_png_encode_decode_identity(w, h, seed):
    """encode_png -> decode_png is the identity on arbitrary rasters
    (every byte value, not just chart colors)."""
    from big_data_backblaze_hard_drive_failure_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    # xorshift-ish deterministic byte stream; hits all filter branches
    # on decode because encode always writes filter 0
    x = seed or 1
    rgb = bytearray()
    for _ in range(w * h * 3):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        rgb.append(x & 0xFF)
    got = decode_png(encode_png(w, h, bytes(rgb)))
    assert got == (w, h, bytes(rgb))


_cell_values = st.one_of(
    st.none(),
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.text(
        alphabet=st.characters(
            # Cc INCLUDED on purpose: showString escapes \n \r \t \f
            # \b \v \a — the fuzz must cover the escaping path.
            # Surrogates (Cs) stay excluded: not valid in transit.
            codec="utf-8", exclude_categories=("Cs", "Cn")
        ),
        max_size=30,
    ),
)


@given(
    rows=st.lists(
        st.tuples(_cell_values, _cell_values), min_size=0, max_size=6
    ),
    n=st.integers(min_value=1, max_value=5),
    truncate=st.sampled_from([0, 3, 5, 20]),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_show_string_property_vs_spark(spark, rows, n, truncate):
    """show_string == Dataset.showString on generated frames: nulls,
    negative ints, empty/unicode/long strings, every truncate regime.
    Rows-as-strings because a mixed int/str column can't infer; ints
    are rendered via CAST so both engines print the same text."""
    from big_data_backblaze_hard_drive_failure_spark.operators.display import (
        show_string,
    )

    data = [
        (str(a) if a is not None else None, str(b) if b is not None else None)
        for a, b in rows
    ]
    df = spark.createDataFrame(data, "a string, b string")
    want = df._jdf.showString(n, truncate, False)
    got = show_string(df, n=n, truncate=truncate)
    assert got.rstrip("\n") == want.rstrip("\n")


@given(n=st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_avro_zigzag_codec_identity(n):
    """zigzag varint encode -> decode is the identity over the full
    Avro long range (the codec every OCF field rides on)."""
    import io as _io

    from big_data_backblaze_hard_drive_failure_spark.sources.avro_py import (
        _zigzag_decode,
        _zigzag_encode,
    )

    assert _zigzag_decode(_io.BytesIO(_zigzag_encode(n))) == n


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            st.one_of(st.none(), st.text(max_size=20)),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
            ),
        ),
        min_size=0,
        max_size=50,
    )
)
@settings(max_examples=20, deadline=None)
def test_avro_ocf_roundtrip_property(rows, tmp_path_factory):
    """write_ocf -> read_ocf is the identity on generated rows —
    pure-Python path, no Spark session, so the codec (not the Data
    Source plumbing) is what's under test."""
    import os
    import uuid

    from pyspark.sql import types as T

    from big_data_backblaze_hard_drive_failure_spark.sources.avro_py import (
        read_ocf,
        write_ocf,
    )

    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType(), False),
            T.StructField("s", T.StringType(), True),
            T.StructField("d", T.DoubleType(), True),
        ]
    )
    path = os.path.join(
        str(tmp_path_factory.mktemp("avro_prop")), f"{uuid.uuid4().hex}.avro"
    )
    write_ocf(path, schema, rows, rows_per_block=7)
    assert list(read_ocf(path, schema)) == [tuple(r) for r in rows]
