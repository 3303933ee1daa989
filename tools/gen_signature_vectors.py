#!/usr/bin/env python3
"""Cross-implementation oracle vectors for the signature operators.

Generates src/main/scala/graft/operators/SignatureVectors.scala: per-doc
expected values for d04 (MinHash), d05 (SimHash), t05 (rolling
fingerprint) and t04 (lang-id), computed by INDEPENDENT pure-Python
implementations of the public algorithms (xxHash64 from the public spec,
java.util.Random from its published LCG, the (a*x+b) mod p universal-hash
family, sign-vote SimHash, polynomial rolling hash, regex stopword
lang-id) — NOT by the Scala engine under test. The driver VALUES-joins
these in DuckDB against the engine's output (the p19 murmur3 recipe).

Optionally folds in /tmp/sketches.csv (vec_id,sketch from
graft.tools.SketchDump) for the s04 oracle: the 32-bit hyperplane sketch
is arbitrary-by-construction (seeded random planes), so the sketch ints
are engine-exported and only the downstream band/bucket/pair/cosine
logic is independently recomputed by DuckDB.

Usage: python3 tools/gen_signature_vectors.py /root/testdata/sf0.01
"""
import re
import sys
import os

MASK64 = (1 << 64) - 1
P = 2147483647  # 2^31 - 1, the minhash prime

# ---------------------------------------------------------------- xxHash64
# From the public xxHash specification (Yann Collet), 64-bit variant.
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc, lane):
    return (_rotl((acc + lane * P2) & MASK64, 31) * P1) & MASK64


def _merge(h, acc):
    return ((h ^ _round(0, acc)) * P1 + P4) & MASK64


def xxh64(data: bytes, seed: int) -> int:
    """Unsigned 64-bit xxHash64 of `data` with `seed`."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = ((_rotl(h ^ k, 27) * P1) + P4) & MASK64
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h = ((_rotl(h ^ ((lane * P1) & MASK64), 23) * P2) + P3) & MASK64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * P5) & MASK64), 11) * P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """xxHash64 as Java's signed long (Spark's xxhash64 seed is 42)."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


# Public spec test vectors (xxHash repository, XSUM_XXH64 sanity checks).
assert xxh64(b"", 0) == 0xEF46DB3751D8E999
assert xxh64(b"", 2654435761) == 0xAC75FDA2929B17EF
assert xxh64(bytes([0x9E]), 0) == 0x4FCE394CC88952D8
assert xxh64(b"xxhash", 0) == 0x32DD38952C4BC720


# -------------------------------------------------- java.util.Random (LCG)
class JavaRandom:
    """java.util.Random per the published algorithm (48-bit LCG)."""

    def __init__(self, seed: int):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self.seed >> (48 - bits)

    def next_long(self) -> int:
        hi = self._next(32)
        if hi >= (1 << 31):
            hi -= 1 << 32
        lo = self._next(32)
        if lo >= (1 << 31):
            lo -= 1 << 32
        v = ((hi << 32) + lo) & MASK64
        return v - (1 << 64) if v >= (1 << 63) else v


def minhash_params(k: int):
    """TextFns.minhashParams: scala.util.Random(0x5eed) == java.util.Random."""
    rnd = JavaRandom(0x5EED)
    out = []
    for _ in range(k):
        a = (rnd.next_long() & ((1 << 63) - 1)) % (P - 1) + 1
        b = (rnd.next_long() & ((1 << 63) - 1)) % P
        out.append((a, b))
    return out


# ------------------------------------------------------------- tokenization
# Spark: split(trim(text), "\\s+") — trim strips ASCII spaces only; Java
# regex \s is [ \t\n\x0B\f\r]; split keeps leading/trailing empty strings
# (limit -1), matching Python re.split on this pattern.
WS = re.compile(r"[ \t\n\x0b\f\r]+")


def tokens(text: str):
    t = text.strip(" ")
    if t == "":
        return []
    return WS.split(t)


# ------------------------------------------------------------------ minhash
def shingle_minhash(toks, n: int, k: int, params):
    """ShingleMinHashImpl.sig: minhash over n-token windows joined by ' '."""
    cnt = len(toks) - n + 1
    if cnt <= 0:
        return None
    mins = [None] * k
    for i in range(cnt):
        h = xxh64_signed(" ".join(toks[i:i + n]).encode("utf-8")) % P
        for j, (a, b) in enumerate(params):
            v = (h * a + b) % P
            if mins[j] is None or v < mins[j]:
                mins[j] = v
    return mins


# ------------------------------------------------------------------ simhash
def simhash64(toks):
    """SimHash64Impl.hash: per-token xxh64 bit votes, sign -> bit."""
    if not toks:
        return None
    votes = [0] * 64
    for t in toks:
        h = xxh64(t.encode("utf-8"), 42)  # unsigned; bit tests identical
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if votes[b] > 0:
            out |= 1 << b
    return out - (1 << 64) if out >= (1 << 63) else out


# -------------------------------------------------------------- fingerprint
def rolling_fingerprint(text: str) -> int:
    """TextFns.rollingFingerprint: h = (h*B + tokhash) mod p over tokens."""
    acc = 2166136261 % P
    for t in tokens(text):
        acc = (acc * 1000003 + (xxh64_signed(t.encode("utf-8")) % P)) % P
    return acc


# ---------------------------------------------------------------- lang-id
# LangIdImpl.langMarkers, scored as regexp_count(lower(text),
# "\b(m1|m2|...)\b") per language; leftmost non-overlapping alternation in
# declared order (Python re semantics match Java's here), argmax over
# (score, lang) with the lexicographically greatest lang winning ties.
LANG_MARKERS = [
    ("en", ["the", "and", "of", "to", "is", "that", "with"]),
    ("fr", ["le", "la", "et", "les", "des", "est", "une"]),
    ("de", ["der", "die", "und", "das", "ist", "nicht", "mit"]),
    ("es", ["el", "los", "las", "es", "una", "que", "para"]),
    ("it", ["il", "gli", "che", "di", "non", "sono", "per"]),
    ("pt", ["o", "os", "as", "um", "uma", "não", "com"]),
    ("nl", ["de", "het", "een", "van", "niet", "zijn", "voor"]),
]
LANG_RES = [(lang, re.compile(r"\b(?:" + "|".join(ms) + r")\b"))
            for lang, ms in LANG_MARKERS]


def lang_id(text: str) -> str:
    lowered = text.lower()
    best = max((len(rx.findall(lowered)), lang) for lang, rx in LANG_RES)
    return best[1] if best[0] > 0 else "und"


# ------------------------------------------------------------------- driver
def sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import pyarrow.parquet as pq
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pylist()
    docs.sort(key=lambda r: r["doc_id"])
    params = minhash_params(16)

    d04, d05, t05, langs = [], [], [], {}
    for r in docs:
        did, text = r["doc_id"], r["text"]
        toks = tokens(text)
        sig = shingle_minhash(toks, 3, 16, params)
        # concat_ws(",", NULL array) yields '' (non-null), matching Spark
        csv = "" if sig is None else ",".join(str(v) for v in sig)
        d04.append(f"({did}, {sql_str(csv)})")
        sh = simhash64(toks)
        d05.append(f"({did}, {'NULL' if sh is None else sh})")
        t05.append(f"({did}, {rolling_fingerprint(text)})")
        lang = lang_id(text)
        langs[lang] = langs.get(lang, 0) + 1

    t04 = [f"({sql_str(lang)}, {n})" for lang, n in sorted(langs.items())]

    # s04: engine-exported sketches (graft.tools.SketchDump), if present
    s04 = []
    sketch_csv = "/tmp/sketches.csv"
    if os.path.exists(sketch_csv):
        with open(sketch_csv) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("vec_id"):
                    continue
                vid, sk = line.split(",")
                s04.append(f"({int(vid)}, {int(sk)})")
        s04.sort(key=lambda s: int(s[1:s.index(",")]))

    def scala_seq(rows):
        body = ",\n    ".join('"' + r.replace("\\", "\\\\").replace('"', '\\"') + '"'
                              for r in rows)
        return "Seq(\n    " + body + ")"

    out = """package graft.operators

/** GENERATED by tools/gen_signature_vectors.py — do not edit by hand.
  *
  * DuckDB VALUES rows for the signature-operator oracles, computed over
  * @SFDIR@/documents.parquet by independent pure-Python implementations
  * of the public algorithms (xxHash64 spec, java.util.Random LCG,
  * (a·x+b) mod p minhash family, sign-vote SimHash, polynomial rolling
  * hash, regex stopword lang-id) — NOT by this engine. A mismatch in
  * CORRECTNESS therefore means one of the two implementations diverges
  * from the public algorithm (the p19 murmur3 oracle recipe).
  *
  * s04Sketch is the one exception: hyperplane sketches are arbitrary by
  * construction (seeded random planes), so those ints are engine-exported
  * (graft.tools.SketchDump) and only the downstream band/bucket/pair/
  * cosine logic is independently recomputed in SQL.
  */
object SignatureVectors {

  /** (doc_id, minhash sig csv) — shingle_minhash(tokens, n=3, k=16). */
  val d04Minhash: Seq[String] = @D04@

  /** (doc_id, simhash64 over tokens) as signed BIGINT. */
  val d05Simhash: Seq[String] = @D05@

  /** (doc_id, rolling polynomial fingerprint mod 2^31-1). */
  val t05Fingerprint: Seq[String] = @T05@

  /** (lang_pred, n) — expected lang-id distribution over the corpus. */
  val t04LangCounts: Seq[String] = @T04@

  /** (vec_id, 32-bit hyperplane sketch) — engine-exported, see above. */
  val s04Sketch: Seq[String] = @S04@

  /** Render rows as a DuckDB VALUES body. */
  def values(rows: Seq[String]): String = rows.mkString(",\\n  ")
}
"""
    out = (out.replace("@SFDIR@", sf_dir)
           .replace("@D04@", scala_seq(d04))
           .replace("@D05@", scala_seq(d05))
           .replace("@T05@", scala_seq(t05))
           .replace("@T04@", scala_seq(t04))
           .replace("@S04@", scala_seq(s04) if s04 else "Seq.empty"))
    path = "src/main/scala/graft/operators/SignatureVectors.scala"
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}: d04={len(d04)} d05={len(d05)} t05={len(t05)} "
          f"t04={t04} s04={len(s04)}")


if __name__ == "__main__":
    main()
