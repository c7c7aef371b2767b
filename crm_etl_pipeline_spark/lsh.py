"""Shared LSH bucket utilities: bounded in-bucket pair generation.

Every near-dedup operator in the engine (MinHash bands, SimHash bands,
embedding sign buckets) generates candidate pairs INSIDE hash buckets —
never all-pairs. LSH theory keeps buckets near the true-cluster size,
but real corpora have pathological hot buckets (mass boilerplate: empty
pages, license headers, templated spam) where one band signature can
hold millions of members. Unbounded, that is an O(n²) pair explosion
downstream of every hot bucket.

``capped_pair_array`` bounds the pair output WITHOUT silently dropping
buckets: buckets at or under the cap emit the full pairwise set (exact
candidate semantics); buckets over the cap degrade to STAR pairs —
every member paired with the bucket's first (minimum) member, the
anchor. Star emission is O(n) in bucket size, and
``bounded_sorted_members`` bounds the membership ARRAY itself: members
are ranked within the bucket before collection and only the first
``MEMBER_CAP`` are collected, so a 10⁶-member boilerplate bucket
builds a 16 384-element array row, never a 10⁶-element one (the true
size survives as ``n_members``).

Cap/downstream-filter contract, stated precisely: star pairs keep every
member attached to the anchor IN THE PAIR OUTPUT, but downstream
per-pair filters can still drop them — a star pair from a single
over-cap band has n_shared_bands = 1, and similarity thresholds
(hamming, cosine) score the member against the ANCHOR only. Consumers
therefore either (a) bypass count thresholds for capped-bucket pairs —
``minhash_near_dup`` emits a ``from_capped`` flag and
``dedup_components`` keeps flagged edges regardless of its ≥2-band
rule — or (b) accept a documented recall trade at the cap boundary
(simhash/embedding, where the threshold is a genuine similarity test).

The cap is surfaced, not silent: ``lsh_bucket_profile`` (queries/
llmops.py) reports the bucket-size distribution and over-cap count per
band as a first-class oracle-checked query, the pair arrays carry an
``is_capped`` flag per bucket, and every consumer's DuckDB oracle
models the cap (over-cap buckets contribute only anchor-rooted star
pairs), so Spark and oracle agree at any bucket size.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

#: max members for exact pairwise generation; wider buckets emit star
#: pairs. 256 members = 32 640 pairs — comfortably inside one task —
#: while a true hot bucket (10^6 boilerplate docs) stays linear.
BUCKET_CAP = 256

#: max members ever COLLECTED per bucket (64× BUCKET_CAP): the bound on
#: the membership array row itself. Members ranked past this prefix
#: lose their in-bucket candidate edges — a recall trade that begins
#: 64× past where star degradation already applies, and that every
#: consumer's oracle models with the same rank rule.
MEMBER_CAP = 64 * BUCKET_CAP


def capped_pair_array(
    members: Column, make_pair: Callable[[Column, Column], Column], cap: int = BUCKET_CAP
) -> Column:
    """All ordered in-bucket pairs, bounded by ``cap``.

    ``members`` must be a SORTED array column (sort_array of the
    collect_list) so pair order and the star anchor (the minimum
    member) are deterministic. ``make_pair(a, b)`` builds one pair
    struct from two member elements.

    size ≤ cap → full pairwise: for members[i], partners members[i+1:].
    size > cap → star: (members[0], members[i]) for i ≥ 1 — O(n), keeps
    every member connected to the cluster anchor.
    """
    full = F.flatten(
        F.transform(
            members,
            lambda x, i: F.transform(
                F.slice(members, i + 2, F.size(members)),
                lambda y: make_pair(x, y),
            ),
        )
    )
    star = F.transform(
        F.slice(members, 2, F.size(members) - 1),
        lambda y: make_pair(F.element_at(members, 1), y),
    )
    return F.when(F.size(members) <= F.lit(cap), full).otherwise(star)


def is_capped(members: Column, cap: int = BUCKET_CAP) -> Column:
    """Per-bucket flag: true when this bucket degraded to star pairs.
    Valid on ``bounded_sorted_members`` output too: the collected size
    is min(n, MEMBER_CAP), and min(n, MEMBER_CAP) > cap ⟺ n > cap
    because MEMBER_CAP > cap."""
    return F.size(members) > F.lit(cap)


def bounded_sorted_members(
    df,
    bucket_cols: list[str],
    member: Column,
    order: Column,
    member_cap: int = MEMBER_CAP,
    alias: str = "members",
):
    """Per-bucket sorted membership arrays with the ARRAY ITSELF bounded.

    Members are ranked within their bucket by ``order`` ascending (the
    star anchor is rank 1) BEFORE collection, and only the first
    ``member_cap`` are collected — so neither the aggregation buffer nor
    the materialized row is ever O(bucket): a pathological 10⁶-member
    bucket builds a ``member_cap``-element array. The TRUE bucket size
    survives as ``n_members``. The rank window and the collect groupBy
    hash-partition on the same bucket key, so Spark reuses one Exchange
    — the bound costs a partition sort, not an extra shuffle. Buckets
    need ≥2 members to emit pairs; smaller ones are dropped here.

    ``order`` must be unique within a bucket (doc_id/vec_id) so the
    prefix is deterministic and matches the oracle's ROW_NUMBER rule.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*bucket_cols).orderBy(order)
    ranked = (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(Window.partitionBy(*bucket_cols)))
    )
    return (
        ranked.filter(F.col("_rk") <= F.lit(member_cap))
        .groupBy(*bucket_cols)
        .agg(
            F.sort_array(F.collect_list(member)).alias(alias),
            F.first("n_members").alias("n_members"),
        )
        .filter(F.col("n_members") >= 2)
    )
