package graft.operators

/** Deduplication operators for training-data pipelines: exact (content
  * hash), n-gram Jaccard (exact pairwise over shared shingles), MinHash+LSH
  * (banded candidate generation + exact verification) and SimHash (64-bit,
  * block-banded Hamming candidates).
  *
  * Scale design: every operator shuffles on compact derived keys (32-byte
  * hashes, 64-bit minhash band signatures), never on document payloads; the
  * pairwise stages only materialize pairs that share at least one
  * shingle/band/block, so complexity follows actual overlap rather than
  * |docs|². All hashing is `xxhash64` with pinned seeds — deterministic
  * across runs and cluster layouts.
  */
object Dedup
  extends DedupExactOps
  with DedupShingleOps
  with DedupMinhashOps
  with DedupSimhashOps
  with DedupWinnowOps
  with DedupSubstringOps
