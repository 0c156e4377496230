"""Regression tests for round-10 optimization-round changes.

Every change this round is a performance restructure that must not
move a single output value; these tests pin the equivalences that
are not already covered by the oracle sweep:

1. the backtrack-free effect regex ``(.[^;]*);`` matches exactly
   what the reference's lazy ``(.+?);`` matched, on the edge cases
   where the two forms could plausibly diverge;
2. ``bpe_train_with_sizes`` (single merge loop) returns the same
   merge table and the same word→symbol-count map as the
   train-then-``bpe_word_sizes`` double loop;
3. ``bpe_apply_merges`` with a precomputed ``word_sizes`` equals the
   recompute path.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from eggv_spark.operators import text_analysis as T
from eggv_spark.operators.variants import _EFFECT_PATTERN


#: The reference's pattern (eggv/process.py:158) — the ground truth
#: the optimized pattern must reproduce match-for-match.
_REFERENCE_EFFECT_PATTERN = r"Variant_effect=(.+?);"

EFFECT_EDGE_CASES = [
    # (attr, expected capture or None)
    ("Variant_effect=missense 0 mRNA T1;", "missense 0 mRNA T1"),
    ("a=b;Variant_effect=x;c=d;", "x"),
    # no trailing ';' — both forms miss the last attribute (the
    # documented reference quirk)
    ("a=b;Variant_effect=x", None),
    # empty value then ';': lazy '.' CAN consume the ';' itself when
    # another ';' follows — the one place a naive [^;]+ rewrite
    # would diverge
    ("Variant_effect=;;", ";"),
    ("Variant_effect=;x;", ";x"),
    ("Variant_effect=;x", None),
    ("Variant_effect=", None),
    ("Variant_effect=;", None),
    ("", None),
    ("Variant_effect=a;b;", "a"),
    ("prefix Variant_effect=stop_gained 1 mRNA T2;suffix", "stop_gained 1 mRNA T2"),
]


@pytest.mark.parametrize("attr,expected", EFFECT_EDGE_CASES)
def test_effect_pattern_matches_reference_lazy_form(attr, expected):
    ref = re.search(_REFERENCE_EFFECT_PATTERN, attr)
    opt = re.search(_EFFECT_PATTERN, attr)
    assert (ref.group(1) if ref else None) == expected
    assert (opt.group(1) if opt else None) == expected


def test_effect_pattern_equivalent_in_spark(spark):
    """Same equivalence through Spark's (Java) regex engine, where
    the optimized pattern actually runs."""
    df = spark.createDataFrame(
        [(a,) for a, _ in EFFECT_EDGE_CASES], "attr: string"
    )
    out = df.select(
        F.regexp_extract("attr", _REFERENCE_EFFECT_PATTERN, 1).alias("ref"),
        F.regexp_extract("attr", _EFFECT_PATTERN, 1).alias("opt"),
    ).collect()
    for row in out:
        assert row["ref"] == row["opt"]


@pytest.fixture(scope="module")
def bpe_docs(spark):
    rows = [
        (i, f"low lower lowest newer newest wide widest tok{i % 5} b{i % 3}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_bpe_single_loop_matches_double_loop(spark, bpe_docs):
    n = 4
    merges_ref = T.bpe_train_merges(bpe_docs, n_merges=n)
    sizes_ref = T.bpe_word_sizes(bpe_docs, merges_ref, n)
    merges_one, sizes_one = T.bpe_train_with_sizes(bpe_docs, n_merges=n)

    mt_ref = sorted(map(tuple, merges_ref.collect()))
    mt_one = sorted(map(tuple, merges_one.collect()))
    assert mt_ref == mt_one

    ws_ref = sorted(map(tuple, sizes_ref.collect()))
    ws_one = sorted(map(tuple, sizes_one.collect()))
    assert ws_ref == ws_one


def test_bpe_apply_with_precomputed_sizes_matches_recompute(spark, bpe_docs):
    n = 3
    merges, sizes = T.bpe_train_with_sizes(bpe_docs, n_merges=n)
    via_recompute = sorted(
        map(tuple, T.bpe_apply_merges(bpe_docs, merges, n).collect())
    )
    via_precomputed = sorted(
        map(
            tuple,
            T.bpe_apply_merges(
                bpe_docs, merges, n, word_sizes=sizes
            ).collect(),
        )
    )
    assert via_recompute == via_precomputed
