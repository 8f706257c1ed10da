"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM-side, whole-stage codegen, no UDFs),
each with an exact DuckDB-SQL oracle equivalent (__spark_entry__).
Rounding to 6 dp keeps float value-hashes engine-stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny stopword list used by the quality heuristic (public knowledge)
STOPWORDS = (
    "the a an and or of to in is are was were be been on for with as at by it this that",
)


def token_count(text: Column) -> Column:
    """Whitespace token count (string_split parity with DuckDB)."""
    return F.size(F.filter(F.split(text, " "), lambda x: x != ""))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-like subword count: word chunks + digit runs + punctuation,
    approximated as regexp matches of `[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]`.
    Vectorized via regexp_count (Spark 3.5+ / DuckDB parity)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"))


def punct_ratio(text: Column) -> Column:
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return F.round(n_punct / F.greatest(F.length(text), F.lit(1)), 6)


def stopword_ratio(text: Column) -> Column:
    words = F.filter(F.split(F.lower(text), " "), lambda x: x != "")
    stop = F.filter(
        words, lambda w: w.isin(*STOPWORDS[0].split(" "))
    )
    return F.round(
        F.size(stop) / F.greatest(F.size(words), F.lit(1)).cast("double"), 6
    )


def mean_word_len(text: Column) -> Column:
    words = F.filter(F.split(text, " "), lambda x: x != "")
    total = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return F.round(total / F.greatest(F.size(words), F.lit(1)).cast("double"), 6)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: favors medium length,
    low punctuation, and a sane mean word length.  Deterministic,
    SQL-expressible (oracle in __spark_entry__)."""
    length_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    wl = mean_word_len(text)
    wordlen_term = F.when((wl >= 3.0) & (wl <= 8.0), 1.0).otherwise(0.5)
    return F.round((length_term + punct_term + wordlen_term) / 3.0, 6)


def lang_id(text: Column) -> Column:
    """N-gram-heuristic language ID (en/fr/de/unknown) from marker-word
    hit counts — a deterministic stand-in for a real classifier with
    the same plan shape (scan -> regexp counts -> argmax)."""
    en = F.regexp_count(F.lower(text), F.lit(r"\b(the|and|of|to|is)\b"))
    fr = F.regexp_count(F.lower(text), F.lit(r"\b(le|la|les|et|est)\b"))
    de = F.regexp_count(F.lower(text), F.lit(r"\b(der|die|das|und|ist)\b"))
    return (
        F.when((en >= fr) & (en >= de) & (en > 0), "en")
        .when((fr >= de) & (fr > 0), "fr")
        .when(de > 0, "de")
        .otherwise("unknown")
    )


# ---------------------------------------------------------------------------
# Trained language ID: naive Bayes over character trigrams
# ---------------------------------------------------------------------------

# Seeded labeled fixture (public sample sentences, written for this
# repo).  The classifier is TRAINED from these at import time — pure
# deterministic Python arithmetic — and scored with plan-only column
# expressions, so the DuckDB oracle reproduces it bit-for-bit from the
# same literals (lang_id_trained_oracle_sql).
LANG_FIXTURE = {
    "en": [
        "the quick brown fox jumps over the lazy dog",
        "this is a simple english sentence about the weather today",
        "we are going to the market and then to the park",
        "she said that the meeting would start in the morning",
        "the children were playing with their friends in the garden",
        "i think that this approach is better than the other one",
    ],
    "fr": [
        "le chat est sur la table et il regarde par la fenetre",
        "nous allons au marche et ensuite dans le parc",
        "elle a dit que la reunion commencerait dans la matinee",
        "les enfants jouaient avec leurs amis dans le jardin",
        "je pense que cette approche est meilleure que l autre",
        "il fait tres beau aujourd hui et le ciel est bleu",
    ],
    "de": [
        "der schnelle braune fuchs springt ueber den faulen hund",
        "wir gehen zum markt und dann in den park",
        "sie sagte dass die besprechung am morgen beginnen wuerde",
        "die kinder spielten mit ihren freunden im garten",
        "ich denke dass dieser ansatz besser ist als der andere",
        "das wetter ist heute sehr schoen und der himmel ist blau",
    ],
}


def train_char_trigram_nb(fixture=None, k: float = 0.5, top_n: int = 40):
    """Train the trigram naive-Bayes model: add-k smoothed
    log-probabilities over a vocabulary of the ``top_n`` most frequent
    trigrams per language (union, sorted — deterministic).  Returns
    {"vocab": [tri...], "langs": [lang...], "logp": {lang: [..]},
    "logp_oov": {lang: f}, "logprior": {lang: f}}.

    Trigram counting convention: NON-overlapping occurrences (the
    replace-based count both engines evaluate identically); training
    uses the same convention so model and scorer agree."""
    import math

    fixture = fixture or LANG_FIXTURE

    def count_tri(text: str, tri: str) -> int:
        return (len(text) - len(text.replace(tri, ""))) // 3

    counts: dict = {}
    all_tris: dict = {}
    for lang, sents in sorted(fixture.items()):
        c: dict = {}
        for s in sents:
            s = s.lower()
            for i in range(max(0, len(s) - 2)):
                tri = s[i:i + 3]
                c[tri] = c.get(tri, 0) + 1
        counts[lang] = c
        for tri, n in c.items():
            all_tris.setdefault(lang, []).append((n, tri))
    vocab = sorted(
        {
            tri
            for lang, pairs in all_tris.items()
            for _, tri in sorted(pairs, key=lambda t: (-t[0], t[1]))[:top_n]
        }
    )
    langs = sorted(fixture)
    logp: dict = {}
    logp_oov: dict = {}
    n_docs = {lang: len(fixture[lang]) for lang in langs}
    total_docs = sum(n_docs.values())
    logprior = {
        lang: math.log(n_docs[lang] / total_docs) for lang in langs
    }
    for lang in langs:
        c = counts[lang]
        # replace-convention counts over the vocab; everything else
        # (plus unseen) shares one smoothed OOV bucket
        def rc(tri):
            return sum(count_tri(s.lower(), tri) for s in fixture[lang])

        vocab_counts = [rc(tri) for tri in vocab]
        total = sum(vocab_counts)
        denom = total + k * (len(vocab) + 1)
        logp[lang] = [
            math.log((n + k) / denom) for n in vocab_counts
        ]
        logp_oov[lang] = math.log(k / denom)
    return {
        "vocab": vocab,
        "langs": langs,
        "logp": logp,
        "logp_oov": logp_oov,
        "logprior": logprior,
    }


_NB_MODEL = None


def _nb_model():
    global _NB_MODEL
    if _NB_MODEL is None:
        _NB_MODEL = train_char_trigram_nb()
    return _NB_MODEL


def lang_id_trained(text: Column, model: dict | None = None) -> Column:
    """Naive-Bayes language prediction as PURE column arithmetic:
    per vocab trigram, a replace-based occurrence count; per language,
    score = logprior + sum(count * logp) + max(0, n_trigrams -
    sum(count)) * logp_oov; argmax with ties to the lexicographically
    first language.  Whole-stage codegen, no UDF; the DuckDB oracle
    (lang_id_trained_oracle_sql) is generated from the SAME model
    literals in the SAME evaluation order, so results hash-match."""
    m = model or _nb_model()
    t = F.lower(F.coalesce(text, F.lit("")))
    cnt = {
        tri: (
            (F.length(t) - F.length(F.replace(t, F.lit(tri))))
            / F.lit(3)
        ).cast("double")
        for tri in m["vocab"]
    }
    n_tris = F.greatest(
        F.length(t) - F.lit(2), F.lit(0)
    ).cast("double")
    scores = {}
    for lang in m["langs"]:
        s = F.lit(float(m["logprior"][lang]))
        csum = F.lit(0.0)
        for tri, lp in zip(m["vocab"], m["logp"][lang]):
            s = s + cnt[tri] * F.lit(float(lp))
            csum = csum + cnt[tri]
        s = s + F.greatest(n_tris - csum, F.lit(0.0)) * F.lit(
            float(m["logp_oov"][lang])
        )
        scores[lang] = s
    pred = None
    langs = m["langs"]
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1:]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        branch = F.lit(lang)
        if cond is None:
            pred = pred.otherwise(branch) if pred is not None else branch
        else:
            pred = (
                F.when(cond, branch)
                if pred is None
                else pred.when(cond, branch)
            )
    return pred


def lang_id_trained_oracle_sql(
    table: str = "documents", text_col: str = "text",
    id_col: str = "doc_id", model: dict | None = None,
) -> str:
    """DuckDB SQL mirroring lang_id_trained EXACTLY: same model
    literals, same replace-based counts, same summation order, same
    tie policy — the trained classifier's value-check oracle."""
    m = model or _nb_model()

    def esc(s: str) -> str:
        return s.replace("'", "''")

    cnt_exprs = []
    for j, tri in enumerate(m["vocab"]):
        cnt_exprs.append(
            f"CAST((length(t) - length(replace(t, '{esc(tri)}', '')))"
            f" / 3 AS DOUBLE) AS c{j}"
        )
    score_exprs = []
    for lang in m["langs"]:
        parts = [f"{float(m['logprior'][lang])!r}"]
        csum = " + ".join(f"c{j}" for j in range(len(m["vocab"])))
        for j, lp in enumerate(m["logp"][lang]):
            parts.append(f"c{j} * {float(lp)!r}")
        parts.append(
            f"greatest(ntris - ({csum}), 0.0) * "
            f"{float(m['logp_oov'][lang])!r}"
        )
        score_exprs.append(f"({' + '.join(parts)}) AS s_{lang}")
    langs = m["langs"]
    branches = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= s_{o}" for o in langs[i + 1:]]
        if conds:
            branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
        else:
            branches.append(f"ELSE '{lang}'")
    case = "CASE " + " ".join(branches) + " END"
    return f"""
WITH base AS (
  SELECT {id_col}, lower(coalesce({text_col}, '')) AS t FROM {table}
),
cnts AS (
  SELECT {id_col},
         CAST(greatest(length(t) - 2, 0) AS DOUBLE) AS ntris,
         {', '.join(cnt_exprs)}
  FROM base
),
scored AS (
  SELECT {id_col}, {', '.join(score_exprs)} FROM cnts
)
SELECT {id_col}, {case} AS lang_pred FROM scored
"""


def fingerprint64(text: Column) -> Column:
    """Deterministic 60-bit document fingerprint: md5-derived (engine-
    agnostic, DuckDB-reproducible), analog of the reference's content
    hashing for duplicate detection (HashOperations.scala:18-60)."""
    return F.conv(F.substring(F.md5(text), 1, 15), 16, 10).cast("long")
