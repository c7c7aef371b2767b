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
anchor. Star emission is O(n) in bucket size. NOTE the cap bounds the
PAIR explosion only: the collect_list membership array is still O(n)
per bucket row (a 10⁶-member bucket builds a 10⁶-element array — tens
of MB, survivable where n² pairs are not; slice() the membership first
if even that is a concern).

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
