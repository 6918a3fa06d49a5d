"""Shingle / MinHash / SimHash column expressions — all JVM-side.

The reference (MinishLab/semhash) embeds whole texts with a static
model and delegates similarity search to an in-memory ANN index
(semhash/index.py:31-48). At 10^12-file scale there is no global
index; instead we compute per-row sketches with pure Catalyst
expressions so the entire featurization stage stays inside
whole-stage codegen — no Python worker, no Arrow transfer, no
shuffle. Sketches:

* ``shingle_hashes``: distinct xxhash64 of word/char k-grams.
* ``minhash_signature``: ``sig[p] = min_s xxhash64(s, p)`` — the
  classic Broder scheme with the permutation family realized as
  seeded xxhash64 instead of ``(a*x+b) mod P`` (no 64-bit modular
  multiply overflow, identical collision behavior in practice).
* ``simhash64``: 64-bit weighted bit-vote fingerprint.

Everything is expressed with SQL lambda higher-order functions
(transform/aggregate/filter), which Catalyst evaluates without
leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: str | Column, pattern: str = r"\s+") -> Column:
    """Non-empty whitespace-separated tokens of a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, pattern), lambda t: t != F.lit(""))


def shingle_strings(col: str | Column, k: int, mode: str = "word") -> Column:
    """Distinct k-gram shingle strings of a text column.

    Texts shorter than k units produce a single shingle (the whole
    text) so no row ever has an empty shingle set — mirrors the
    reference's behavior of always producing an embedding per record
    (semhash/utils.py:64-84 embeds every record unconditionally).

    Expression-engineering note: the token array is bound via a
    single-element ``transform`` lambda ("let" idiom) so the split is
    evaluated ONCE per row even after Catalyst's CollapseProject
    inlines this expression — never once per shingle.
    """
    name = col if isinstance(col, str) else None
    if name is None:
        raise ValueError("shingle_strings needs a column name (used in SQL expr)")
    if mode == "word":
        # let w = tokens(name) in <shingles over w>, via transform-over-
        # single-element-array binding; w is a lambda var => evaluated once.
        return F.expr(
            f"""
            element_at(transform(array(filter(split({name}, '\\\\s+'), t -> t != '')),
              w -> CASE WHEN size(w) < {k}
                 THEN array(concat_ws(' ', w))
                 ELSE array_distinct(transform(
                        sequence(1, size(w) - {k} + 1),
                        i -> concat_ws(' ', slice(w, i, {k}))))
              END), 1)
            """
        )
    elif mode == "char":
        return F.expr(
            f"""
            element_at(transform(array({name}), s ->
              CASE WHEN length(s) < {k}
                 THEN array(s)
                 ELSE array_distinct(transform(
                        sequence(1, length(s) - {k} + 1),
                        i -> substring(s, i, {k})))
              END), 1)
            """
        )
    raise ValueError(f"unknown shingle mode {mode!r}")


def shingle_hashes(col: str, k: int, mode: str = "word") -> Column:
    """Distinct xxhash64 values of the k-gram shingles (array<long>)."""
    sh = shingle_strings(col, k, mode)
    return F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s)))


_LONG_MAX = 9223372036854775807


def minhash_signature(shingles_col: str, num_perm: int) -> Column:
    """MinHash signature (array<long> of length num_perm).

    ``sig[p] = min over shingle-hashes s of xxhash64(s, p)``.
    Single-pass formulation: one ``aggregate`` over the shingle array
    with an array-of-mins accumulator, so the (possibly inlined)
    shingle expression is evaluated once per row, not once per
    permutation. Reference counterpart: none — this is the
    distributed stand-in for the ANN index build
    (semhash/index.py:31-48).
    """
    return F.expr(
        f"""
        aggregate(
          {shingles_col},
          array_repeat({_LONG_MAX}L, {num_perm}),
          (acc, s) -> zip_with(acc, sequence(0, {num_perm - 1}),
                               (m, p) -> least(m, xxhash64(s, p))))
        """
    )


def simhash64(shingles_col: str) -> Column:
    """64-bit SimHash fingerprint of a shingle-hash array column.

    Bit b of the output is 1 iff the majority of shingle hashes have
    bit b set (unit-weight vote). Single pass over the shingles with
    a 64-counter accumulator; the bit-fold happens in the aggregate's
    finish lambda.
    """
    return F.expr(
        f"""
        aggregate(
          {shingles_col},
          array_repeat(0L, 64),
          (acc, s) -> zip_with(acc, sequence(0, 63),
                               (c, b) -> c + IF((s >> b) & 1 = 1, 1L, -1L)),
          acc -> aggregate(zip_with(acc, sequence(0, 63),
                                    (c, b) -> IF(c > 0, shiftleft(1L, b), 0L)),
                           0L, (x, y) -> x | y))
        """
    )


def hamming64(a: str | Column, b: str | Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


def simhash_bands(col: str, n_bands: int) -> Column:
    """Split a 64-bit simhash into n_bands bit-slices (array<long>).

    Two fingerprints with hamming distance <= n_bands - 1 share at
    least one identical band (pigeonhole), so banding generates all
    candidates for small hamming radii.
    """
    width = 64 // n_bands
    mask = (1 << width) - 1
    return F.expr(
        f"transform(sequence(0, {n_bands - 1}), "
        f"b -> shiftrightunsigned({col}, b * {width}) & {mask}L)"
    )
