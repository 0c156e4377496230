"""Round-11 A/B: staged token/hash columns vs inline re-evaluation.

Spark higher-order functions are CodegenFallback (interpreted) and
get NO common-subexpression elimination, so an expression that
references an inline ``tokens_col(text)`` N times re-runs the regex
split+filter N times per row.  Round 11 stages those intermediates
as columns in with_shingle_hashes / with_repetition_stats /
with_quality_score / with_token_counts / with_fingerprint /
decontaminate.  This script reproduces the OLD (inline) forms and
measures them against the shipped staged forms on sf0.1 documents,
asserting identical output first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eggv_spark.operators import dedupe as D
from eggv_spark.operators import text_analysis as T
from eggv_spark.operators.text_analysis import (
    STOPWORDS,
    _max_multiplicity,
    shingles_col,
    tokens_col,
    word_tokens_col,
)


def old_with_shingle_hashes(df, text_col="text", shingle_size=3):
    shingles = shingles_col(tokens_col(text_col), shingle_size)
    return df.withColumn("shingles", shingles).withColumn(
        "shingle_hashes",
        F.array_distinct(
            F.transform(F.col("shingles"), lambda s: D.base_hash(s) % D.MINHASH_PRIME)
        ),
    )


def old_with_repetition_stats(df, text_col="text"):
    toks = tokens_col(text_col)
    th = F.transform(toks, lambda s: F.xxhash64(s))
    n = F.size(toks)
    nd = F.size(F.array_distinct(th))
    n1 = F.greatest(n - 1, F.lit(0))
    bigram_h = F.zip_with(
        F.slice(th, 1, n1), F.slice(th, 2, n1), lambda x, y: F.xxhash64(x, y)
    )
    nb = F.size(bigram_h)
    denom = F.greatest(n, F.lit(1)).cast("double")
    bdenom = F.greatest(nb, F.lit(1)).cast("double")
    return df.withColumns(
        {
            "n_words": n,
            "dup_word_frac": F.round((n - nd).cast("double") / denom, 4),
            "max_word_share": F.round(
                _max_multiplicity(th, "long").cast("double") / denom, 4
            ),
            "top_bigram_share": F.round(
                _max_multiplicity(bigram_h, "long").cast("double") / bdenom, 4
            ),
        }
    )


def old_with_quality_score(df, text_col="text"):
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    text_len = F.length(text_col)
    alnum_len = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9 ]", ""))
    mean_tok = F.round(
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double"))
        / F.greatest(n_tokens, F.lit(1)).cast("double"), 4,
    )
    stop_ratio = F.round(
        n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double"), 4
    )
    alnum_ratio = F.round(
        alnum_len.cast("double") / F.greatest(text_len, F.lit(1)).cast("double"), 4
    )
    return df.withColumns(
        {
            "text_len": text_len.cast("long"),
            "n_tokens": n_tokens,
            "mean_token_len": mean_tok,
            "stopword_ratio": stop_ratio,
            "alnum_ratio": alnum_ratio,
        }
    )


def old_with_token_counts(df, text_col="text"):
    toks = tokens_col(text_col)
    words = word_tokens_col(text_col)
    return df.withColumns(
        {
            "n_tokens": F.size(toks),
            "n_words": F.size(words),
            "n_distinct_tokens": F.size(F.array_distinct(toks)),
        }
    )


def main():
    from eggv_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "ab-token-stage", master=f"local[{cpus}]", shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    pairs = {
        "shingle_hashes": (
            lambda: old_with_shingle_hashes(docs).select("doc_id", "shingle_hashes"),
            lambda: D.with_shingle_hashes(docs).select("doc_id", "shingle_hashes"),
        ),
        "repetition": (
            lambda: old_with_repetition_stats(docs).drop("text"),
            lambda: T.with_repetition_stats(docs).drop("text"),
        ),
        "quality": (
            lambda: old_with_quality_score(docs).drop("text"),
            lambda: T.with_quality_score(docs).drop("text"),
        ),
        "token_counts": (
            lambda: old_with_token_counts(docs).drop("text"),
            lambda: T.with_token_counts(docs).drop("text"),
        ),
    }
    for name, (old, new) in pairs.items():
        a = sorted(map(tuple, old().collect()))
        b = sorted(map(tuple, new().collect()))
        assert a == b, f"{name}: outputs diverge"
        print(f"{name}: outputs identical ({len(a)} rows)", flush=True)

    for name, fns in pairs.items():
        for fn in fns:
            fn().write.format("noop").mode("overwrite").save()
        best = [9e9, 9e9]
        for r in range(4):
            for i, fn in enumerate(fns):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                best[i] = min(best[i], time.perf_counter() - t0)
        print(
            f"{name}: old {best[0]:.2f}s -> staged {best[1]:.2f}s "
            f"({best[0] / best[1]:.2f}x) load={os.getloadavg()[0]:.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
