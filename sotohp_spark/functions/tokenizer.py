"""Analysis chain (tokenizer) — behavioral port of the reference's
``extractKeywords`` pipeline.

Reference semantics (modules/service/src/main/scala/fr/janalyse/sotohp/
service/MediaServiceLive.scala:1641-1668, rules model
modules/service/.../model/KeywordRules.scala:8-24), re-derived for
Python/pandas:

1. apply ``rewritings`` once each, in list order; each rewriting
   replaces ALL occurrences of its regex (``$N`` group refs);
2. split on ``[- /,']+``;
3. drop empty fragments;
4. camelCase-split each fragment (zero-width boundary regex
   ``(?=[A-Z][^A-Z])|(?<=[^A-Z])(?=[A-Z]+)``) and lowercase the parts;
5. map each part through ``mappings`` (first match on the lowercased
   token wins; replacement may contain spaces/hyphens);
6. re-split on ``[- ]+`` and drop blank tokens;
7. drop tokens fully matching ``^[-0-9]+$`` (standalone numbers);
8. lowercase;
9. drop tokens in ``ignoring`` (stopwords).

``extract_keywords`` dedups to a set (the reference's return type,
golden vector: rules {ignoring={with,i,am}, mapping nigght->night,
rewriting (42)(thing)->$2$1} over "I am with nigght 42thing" =>
{night, thing42} — MediaServiceCRUDOperationsTest.scala:138-151).

``tokenize`` keeps the full ordered token list (duplicates preserved)
— the engine needs term frequencies for BM25, which the reference
never computes itself (it delegates tf/scoring to Lucene inside ES);
the token *stream* before the final dedup is identical.

The hot path is ``make_term_freq_udf``: an Arrow-batched pandas UDF
that returns per-document ``map<term,tf>`` so the postings shuffle
carries (term, doc_id, tf) — map-side tf aggregation, never raw
tokens.  No per-row Python UDFs anywhere.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# split classes, exactly as the reference
_SPLIT1 = re.compile(r"[- /,']+")
_SPLIT2 = re.compile(r"[- ]+")
_CAMEL = re.compile(r"(?=[A-Z][^A-Z])|(?<=[^A-Z])(?=[A-Z]+)")
# fast-path variant applied BEFORE separator splitting: lookarounds must
# not treat a separator char as the "[^A-Z]" context (in the reference
# chain separators are already gone when camel boundaries are matched)
_CAMEL_SEP_AWARE = re.compile(
    r"(?=[A-Z][^A-Z\- /,'])|(?<=[^A-Z\- /,'])(?=[A-Z]+)"
)
_NUMBERS = re.compile(r"^[-0-9]+$")
_DOLLAR_GROUP = re.compile(r"\$(\d+)")


@dataclass(frozen=True)
class KeywordRules:
    """Port of the reference's KeywordRules (ignoring/mappings/rewritings)."""

    ignoring: frozenset = frozenset()
    mappings: tuple = ()  # tuple[(from, to), ...] — first match wins
    rewritings: tuple = ()  # tuple[(regex, replacement-with-$N), ...]

    # compiled caches (not part of equality/hash)
    _compiled: list = field(default=None, compare=False, hash=False, repr=False)

    def compiled_rewritings(self) -> list:
        pats = []
        for rx, repl in self.rewritings:
            pats.append((re.compile(rx), _DOLLAR_GROUP.sub(r"\\\1", repl)))
        return pats

    def mapping_dict(self) -> dict:
        d = {}
        for frm, to in self.mappings:
            d.setdefault(frm, to)  # first occurrence wins, like .find
        return d

    def to_plain(self) -> dict:
        """Picklable plain form for broadcasting into pandas UDFs."""
        return {
            "ignoring": sorted(self.ignoring),
            "mappings": list(self.mappings),
            "rewritings": list(self.rewritings),
        }

    @staticmethod
    def from_plain(d: dict | None) -> "KeywordRules | None":
        if d is None:
            return None
        return KeywordRules(
            ignoring=frozenset(d.get("ignoring", ())),
            mappings=tuple(tuple(m) for m in d.get("mappings", ())),
            rewritings=tuple(tuple(r) for r in d.get("rewritings", ())),
        )


@dataclass(frozen=True)
class KeywordRulesRouter:
    """Per-source rules resolution.

    The reference resolves KeywordRules per STORE at tokenize time
    (`keywordSentenceToKeywords`, MediaServiceLive.scala:1670-1676;
    rules CRUD :1692-1748) — different stores in one corpus may
    rewrite/ignore differently.  ``by_source`` maps a source id to its
    rules; unknown/null sources fall back to ``default`` (None =
    rules-free fast path).
    """

    by_source: tuple = ()  # tuple[(source, KeywordRules), ...]
    default: KeywordRules | None = None

    def rules_for(self, source) -> KeywordRules | None:
        for s, r in self.by_source:
            if s == source:
                return r
        return self.default

    def to_plain(self) -> dict:
        return {
            "_router": True,
            "by_source": [
                (s, r.to_plain() if r is not None else None)
                for s, r in self.by_source
            ],
            "default": self.default.to_plain() if self.default else None,
        }

    @staticmethod
    def from_plain(d: dict | None) -> "KeywordRulesRouter | None":
        if d is None:
            return None
        return KeywordRulesRouter(
            by_source=tuple(
                (s, KeywordRules.from_plain(r)) for s, r in d.get("by_source", ())
            ),
            default=KeywordRules.from_plain(d.get("default")),
        )


def _camel_parts(fragment: str) -> list:
    # Java's split drops zero-width artifacts at position 0 / trailing;
    # empties are filtered downstream anyway (step 6).
    return [p for p in _CAMEL.split(fragment) if p]


def _tokenize_fast_norules(sentence: str) -> list:
    """Rules-free fast path, provably equivalent to the full chain
    (tests/test_tokenizer.py property test): camel boundaries become
    separators in ONE C-level regex pass over the whole sentence, then
    one split + number filter + lowercase.  Equivalence argument: with
    no rewritings/mappings, the per-fragment camel split commutes with
    the separator split (zero-width camel boundaries cannot span a
    separator, and boundary artifacts at fragment edges are dropped by
    the empty-token filter either way)."""
    parts = _SPLIT1.split(_CAMEL_SEP_AWARE.sub(" ", sentence))
    # p.strip() (not just truthiness) mirrors the chain's
    # `if not tok.strip(): continue` (reference .filter(_.trim.nonEmpty)):
    # tabs/newlines are NOT separator chars, so a whitespace-only
    # fragment like '\t' must be dropped here too, not indexed.
    return [
        p.lower() for p in parts if p.strip() and not _NUMBERS.fullmatch(p)
    ]


def tokenize(sentence: str | None, rules: KeywordRules | None = None) -> list:
    """Full analysis chain, order-preserving, duplicates kept."""
    if not sentence:
        return []
    if rules is None:
        return _tokenize_fast_norules(sentence)
    return _tokenize_chain(sentence, rules)


def _tokenize_chain(sentence: str, rules: KeywordRules | None) -> list:
    """The literal step-by-step chain (reference semantics); the
    fast path is property-tested against this with rules=None."""
    if rules is not None:
        for pat, repl in rules.compiled_rewritings():
            sentence = pat.sub(repl, sentence)
        mapping = rules.mapping_dict()
        ignoring = rules.ignoring
    else:
        mapping = {}
        ignoring = ()

    out = []
    for fragment in _SPLIT1.split(sentence):
        if not fragment:
            continue
        for part in _camel_parts(fragment):
            token = part.lower()
            token = mapping.get(token, token)
            for tok in _SPLIT2.split(token):
                if not tok.strip():
                    continue
                if _NUMBERS.fullmatch(tok):
                    continue
                tok = tok.lower()
                if tok in ignoring:
                    continue
                out.append(tok)
    return out


def extract_keywords(sentence: str | None, rules: KeywordRules | None = None) -> set:
    """Reference-identical keyword extraction (set semantics)."""
    return set(tokenize(sentence, rules))


def tokenize_with_positions(
    sentence: str | None, rules: KeywordRules | None = None
) -> list:
    """Ordered (token, position) pairs for positional postings.

    The token SEQUENCE (first elements) is exactly ``tokenize()``
    (property-tested); positions are indices in the pre-drop stream:
    the counter ADVANCES for tokens removed by the standalone-number
    rule (step 7) and the stopword list (step 9), so a dropped token
    leaves a positional GAP.  That is what makes a phrase match over
    positions agree with a word-boundary regex over the raw text for
    plain-word phrases: "error 2024 retry" indexes error@0, retry@2 —
    NOT adjacent, exactly as the raw text says.  (Analyzed-stream
    divergences remain for camelCase splits and mapping expansions,
    where one raw word yields several tokens at successive positions —
    the standard Lucene analyzed-phrase semantics; positional
    candidates are therefore a SUPERSET of raw-regex matches, which is
    the property phrase_search's verify step relies on.)
    """
    if not sentence:
        return []
    if rules is not None:
        for pat, repl in rules.compiled_rewritings():
            sentence = pat.sub(repl, sentence)
        mapping = rules.mapping_dict()
        ignoring = rules.ignoring
    else:
        mapping = {}
        ignoring = ()

    out = []
    pos = 0
    for fragment in _SPLIT1.split(sentence):
        if not fragment:
            continue
        for part in _camel_parts(fragment):
            token = part.lower()
            token = mapping.get(token, token)
            for tok in _SPLIT2.split(token):
                if not tok.strip():
                    continue
                if _NUMBERS.fullmatch(tok):
                    pos += 1  # dropped token HOLDS its position
                    continue
                tok = tok.lower()
                if tok in ignoring:
                    pos += 1  # dropped token HOLDS its position
                    continue
                out.append((tok, pos))
                pos += 1
    return out


def term_positions(
    sentence: str | None, rules: KeywordRules | None = None
) -> dict:
    """map term -> sorted positions list (len == the term's tf)."""
    d: dict = {}
    for tok, pos in tokenize_with_positions(sentence, rules):
        d.setdefault(tok, []).append(pos)
    return d


# ---------------------------------------------------------------------------
# Vectorized (Arrow-batched) Spark UDF constructors.  Rules are captured
# in plain-dict form in the closure — one pickle per task, reconstructed
# once per batch series, applied in a tight loop over the Arrow batch.
# ---------------------------------------------------------------------------


def make_tokenize_udf(rules: KeywordRules | None = None):
    """pandas UDF: text -> array<string> (ordered tokens, dups kept)."""
    plain = rules.to_plain() if rules is not None else None

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        r = KeywordRules.from_plain(plain)
        return texts.map(lambda s: tokenize(s, r))

    return tokenize_udf


def make_term_freq_udf(rules: KeywordRules | None = None):
    """pandas UDF: text -> map<string,int> term frequencies.

    Emitting tf maps per document is the engine's map-side combine: the
    downstream explode+shuffle moves (term, doc_id, tf) rows, which is
    O(distinct terms per doc), not O(tokens).
    """
    plain = rules.to_plain() if rules is not None else None

    @F.pandas_udf(T.MapType(T.StringType(), T.IntegerType()))
    def term_freq_udf(texts: pd.Series) -> pd.Series:
        r = KeywordRules.from_plain(plain)
        return texts.map(lambda s: dict(Counter(tokenize(s, r))))

    return term_freq_udf


def make_term_freq_udf_routed(router: KeywordRulesRouter):
    """pandas UDF: (text, source) -> map<string,int> term frequencies,
    with the rules chain resolved PER ROW by source (reference
    semantics: per-store rules at tokenize time).  The router rides in
    plain-dict form; resolved rules are memoized per source per batch."""
    plain = router.to_plain()

    @F.pandas_udf(T.MapType(T.StringType(), T.IntegerType()))
    def term_freq_routed_udf(texts: pd.Series, sources: pd.Series) -> pd.Series:
        r = KeywordRulesRouter.from_plain(plain)
        cache: dict = {}
        out = []
        for text, src in zip(texts, sources):
            if src not in cache:
                cache[src] = r.rules_for(src)
            out.append(dict(Counter(tokenize(text, cache[src]))))
        return pd.Series(out)

    return term_freq_routed_udf


def make_term_positions_udf(rules: KeywordRules | None = None):
    """pandas UDF: text -> map<term, array<int>> token positions
    (tokenize_with_positions semantics; array length == the term's tf,
    so the positional postings build derives tf for free)."""
    plain = rules.to_plain() if rules is not None else None

    @F.pandas_udf(T.MapType(T.StringType(), T.ArrayType(T.IntegerType())))
    def term_positions_udf(texts: pd.Series) -> pd.Series:
        r = KeywordRules.from_plain(plain)
        return texts.map(lambda s: term_positions(s, r))

    return term_positions_udf


def make_term_positions_udf_routed(router: KeywordRulesRouter):
    """(text, source) -> map<term, array<int>> with per-row rules
    resolution — the positional analog of make_term_freq_udf_routed."""
    plain = router.to_plain()

    @F.pandas_udf(T.MapType(T.StringType(), T.ArrayType(T.IntegerType())))
    def term_positions_routed_udf(
        texts: pd.Series, sources: pd.Series
    ) -> pd.Series:
        r = KeywordRulesRouter.from_plain(plain)
        cache: dict = {}
        out = []
        for text, src in zip(texts, sources):
            if src not in cache:
                cache[src] = r.rules_for(src)
            out.append(term_positions(text, cache[src]))
        return pd.Series(out)

    return term_positions_routed_udf


def make_keywords_udf(rules: KeywordRules | None = None):
    """pandas UDF: text -> array<string> of DISTINCT tokens, sorted
    (reference `extractKeywords` Set semantics, stable order for tests)."""
    plain = rules.to_plain() if rules is not None else None

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def keywords_udf(texts: pd.Series) -> pd.Series:
        r = KeywordRules.from_plain(plain)
        return texts.map(lambda s: sorted(set(tokenize(s, r))))

    return keywords_udf
