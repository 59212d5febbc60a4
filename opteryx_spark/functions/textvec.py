"""Text-mode COSINE_SIMILARITY twin of the reference.

Reference pipeline (``opteryx/functions/other_functions.py:222`` +
``opteryx/compiled/functions/vectors.pyx``): space-split tokens →
per-byte cleanup (keep [a-z0-9], lower [A-Z], keep '-' unless
word-initial, drop the rest) → words of length ≥2 → irregular-verb
lemma table, else suffix-stripping lemmatizer → drop stop words →
SET of lemmas → 1024-bin count vector via XXH3-64 (two positions per
token) → float32 cosine.  Reproduced here step-for-step so row counts
on value predicates (``... WHERE COSINE_SIMILARITY(col, 'q') > 0.7``)
match the reference exactly.

``IRREGULAR_LEMMAS`` is the reference's linguistic lookup table
(irregular English verb/noun forms — data, reproduced for value parity
like the packaged sample datasets).
"""

from __future__ import annotations

import numpy as np

from opteryx_spark.functions.xxh3 import xxh3_64

VECTOR_SIZE = 1024

# irregular English word → lemma (reference vectors.pyx:20-138)
IRREGULAR_LEMMAS: dict[bytes, bytes] = {
    b"are": b"is", b"arose": b"arise", b"awoke": b"awake", b"was": b"be",
    b"were": b"be", b"born": b"bear", b"bore": b"bear", b"be": b"is",
    b"became": b"become", b"began": b"begin", b"bent": b"bend",
    b"best": b"good", b"better": b"good", b"bit": b"bite", b"bled": b"bleed",
    b"blew": b"blow", b"broke": b"break", b"bred": b"breed",
    b"brought": b"bring", b"built": b"build", b"burnt": b"burn",
    b"burst": b"burst", b"bought": b"buy", b"caught": b"catch",
    b"chose": b"choose", b"clung": b"cling", b"came": b"come",
    b"crept": b"creep", b"dealt": b"deal", b"dug": b"dig", b"did": b"do",
    b"done": b"do", b"drew": b"draw", b"drank": b"drink", b"drove": b"drive",
    b"ate": b"eat", b"famous": b"famous", b"fell": b"fall", b"fed": b"feed",
    b"felt": b"feel", b"fought": b"fight", b"found": b"find",
    b"fled": b"flee", b"flung": b"fling", b"flew": b"fly",
    b"forbade": b"forbid", b"forgot": b"forget", b"forgave": b"forgive",
    b"froze": b"freeze", b"got": b"get", b"gave": b"give", b"grew": b"grow",
    b"had": b"have", b"heard": b"hear", b"hid": b"hide", b"his": b"his",
    b"held": b"hold", b"kept": b"keep", b"knew": b"know", b"knelt": b"kneel",
    b"led": b"lead", b"leapt": b"leap", b"learnt": b"learn",
    b"left": b"leave", b"lent": b"lend", b"lay": b"lie", b"lit": b"light",
    b"lost": b"lose", b"made": b"make", b"meant": b"mean", b"met": b"meet",
    b"men": b"man", b"paid": b"pay", b"people": b"person", b"rode": b"ride",
    b"rang": b"ring", b"rose": b"rise", b"ran": b"run", b"said": b"say",
    b"saw": b"see", b"sold": b"sell", b"sent": b"send", b"shone": b"shine",
    b"shot": b"shoot", b"showed": b"show", b"sang": b"sing",
    b"sank": b"sink", b"sat": b"sit", b"slept": b"sleep",
    b"spoke": b"speak", b"spent": b"spend", b"spun": b"spin",
    b"stood": b"stand", b"stole": b"steal", b"stuck": b"stick",
    b"strove": b"strive", b"sung": b"sing", b"swore": b"swear",
    b"swept": b"sweep", b"swam": b"swim", b"swung": b"swing",
    b"took": b"take", b"taught": b"teach", b"tore": b"tear",
    b"told": b"tell", b"thought": b"think", b"threw": b"throw",
    b"trod": b"tread", b"understood": b"understand", b"went": b"go",
    b"woke": b"wake", b"wore": b"wear", b"won": b"win", b"wove": b"weave",
    b"wept": b"weep", b"would": b"will", b"wrote": b"write",
}


def lemmatize(word: bytes) -> bytes:
    """Suffix-stripping lemmatizer (reference vectors.pyx:270-302):
    sequential first-match rules on the cleaned word."""
    n = len(word)
    if n > 5 and word.endswith(b"ing"):
        if word[n - 4] == word[n - 5]:  # double consonant
            return word[: n - 4]
        return word[: n - 3]
    if n > 4 and word.endswith(b"ed"):
        if word[n - 3] == word[n - 4]:
            return word[: n - 3]
        return word[: n - 2]
    if n > 5 and word.endswith(b"ly"):
        if word[n - 3] == word[n - 4]:
            return word[: n - 3]
        return word[: n - 2]
    if n > 8 and word.endswith(b"ation"):
        return word[: n - 5] + b"e"
    if n > 8 and word.endswith(b"ment"):
        return word[: n - 4]
    if n > 2 and word.endswith(b"s"):
        return word[: n - 1]
    return word


def _clean(token: bytes) -> bytes:
    out = bytearray()
    for b in token:
        if 97 <= b <= 122 or 48 <= b <= 57:
            out.append(b)
        elif 65 <= b <= 90:
            out.append(b + 32)
        elif b == 45 and out:  # '-' kept unless word-initial
            out.append(b)
    return bytes(out)


def tokenize(text: str, stop_words: frozenset[bytes]) -> set[bytes]:
    """Space-split, clean, lemmatize, de-stop → set of lemma bytes."""
    tokens: set[bytes] = set()
    for raw in text.encode("utf-8", "ignore").split(b" "):
        if not raw:
            continue
        word = _clean(raw)
        if len(word) > 1:
            lemma = IRREGULAR_LEMMAS.get(word) or lemmatize(word)
            if lemma not in stop_words:
                tokens.add(lemma)
    return tokens


def vectorize(tokens: set[bytes]) -> np.ndarray:
    """1024-bin uint16 count vector: each token increments TWO positions
    derived from its XXH3-64 (low bits and bits 16..25)."""
    vector = np.zeros(VECTOR_SIZE, dtype=np.uint16)
    for tok in tokens:
        if len(tok) > 1:
            h = xxh3_64(tok)
            vector[h & (VECTOR_SIZE - 1)] += 1
            vector[(h >> 16) & (VECTOR_SIZE - 1)] += 1
    return vector


def cosine_similarities(texts, query: str, stop_words: frozenset[bytes]) -> list:
    """Per-text cosine vs the query, float32 arithmetic like the
    reference (numpy float32 norms and dot)."""
    q_tokens = tokenize(str(query), stop_words)
    if not q_tokens:
        return [0.0] * len(texts)
    qv = vectorize(q_tokens).astype(np.float32)
    q_norm = np.linalg.norm(qv)
    if q_norm == 0.0:
        return [0.0] * len(texts)
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        v = vectorize(tokenize(str(t), stop_words)).astype(np.float32)
        v_norm = np.linalg.norm(v)
        product = v_norm * q_norm
        out.append(0.0 if product == 0 else float(np.dot(v, qv) / product))
    return out
