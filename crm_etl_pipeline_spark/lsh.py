"""Shared LSH bucket utilities: bounded in-bucket pair generation.

Every near-dedup operator in the engine (MinHash bands, SimHash bands,
embedding sign buckets) generates candidate pairs INSIDE hash buckets —
never all-pairs. LSH theory keeps buckets near the true-cluster size,
but real corpora have pathological hot buckets (mass boilerplate: empty
pages, license headers, templated spam) where one band signature can
hold millions of members. Unbounded, that is (a) a single collect_list
row holding the whole cluster — executor OOM — and (b) O(n²) pair
explosion downstream.

``capped_pair_array`` bounds both failure modes WITHOUT silently
dropping buckets: buckets at or under the cap emit the full pairwise
set (exact candidate semantics); buckets over the cap degrade to STAR
pairs — every member paired with the bucket's first (minimum) member.
Star emission is O(n) in bucket size, keeps every member attached to
the cluster (connected-component resolution still collapses it — the
downstream consumer, ``dedup_components``, only needs connectivity),
and loses only the redundant intra-cluster edges. A bucket that wide is
by definition a mass-duplicate cluster, so pairwise scores inside it
carry no extra information.

The cap is surfaced, not silent: ``lsh_bucket_profile`` (queries/
llmops.py) reports the bucket-size distribution and over-cap count per
band as a first-class oracle-checked query, and the pair arrays carry
an ``is_capped`` flag per bucket so callers can count degraded buckets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

#: max members for exact pairwise generation; wider buckets emit star
#: pairs. 256 members = 32 640 pairs — comfortably inside one task —
#: while a true hot bucket (10^6 boilerplate docs) stays linear.
BUCKET_CAP = 256


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
    """Per-bucket flag: true when this bucket degraded to star pairs."""
    return F.size(members) > F.lit(cap)
