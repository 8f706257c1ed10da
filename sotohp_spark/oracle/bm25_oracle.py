"""Single-node pure-Python/pandas BM25 oracle.

This is "the reference engine" for the BM25 contract: the Scala
reference delegates scoring to Elasticsearch/Lucene (default Okapi
BM25, k1=1.2 b=0.75) and implements only the indexing side, so the
rank-identity target is defined by this oracle, which re-derives the
whole pipeline — document materialization under (conv_id, turn_idx)
order, the extractKeywords analysis chain, exact DF/doc-len/avgdl,
Lucene idf, and (score desc, doc_id asc) tie-breaking — with no Spark
involvement whatsoever.

Summation order per doc: query terms ascending (matches the engine's
canonical order), float64 throughout.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from sotohp_spark.functions.tokenizer import KeywordRules, tokenize


class Bm25Oracle:
    def __init__(self, turns_pdf: pd.DataFrame, rules: KeywordRules | None = None,
                 k1: float = 1.2, b: float = 0.75):
        self.rules = rules
        self.k1 = k1
        self.b = b

        t = turns_pdf.copy()
        t["text"] = t["text"].fillna("")
        t = t.sort_values(["conv_id", "turn_idx"], kind="stable")
        docs = (
            t.groupby("conv_id", sort=True)
            .agg(
                doc_text=("text", lambda s: " ".join(x for x in s if x)),
                doc_ts=("ts", "min"),
                n_turns=("text", "size"),
            )
            .reset_index()
        )
        docs = docs.sort_values(["doc_ts", "conv_id"], kind="stable").reset_index(
            drop=True
        )
        docs["doc_id"] = range(len(docs))

        self.docs = docs
        self.tfs: list[Counter] = [
            Counter(tokenize(s, rules)) for s in docs["doc_text"]
        ]
        self.doc_len = [sum(c.values()) for c in self.tfs]
        self.n_docs = len(docs)
        self.avgdl = (
            float(sum(self.doc_len)) / self.n_docs if self.n_docs else 0.0
        )
        self.df: Counter = Counter()
        for c in self.tfs:
            self.df.update(c.keys())

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log1p((self.n_docs - d + 0.5) / (d + 0.5))

    def top_k(self, query_text: str, k: int = 10, conjunctive: bool = False) -> pd.DataFrame:
        toks = tokenize(query_text, self.rules)
        qtf = Counter(toks)
        terms = sorted(t for t in qtf if t in self.df)
        if conjunctive and len(terms) < len(set(toks)):
            terms = []  # reference AND semantics: absent term -> empty
        rows = []
        if terms:
            k1, b, avgdl = self.k1, self.b, self.avgdl
            for doc_id in range(self.n_docs):
                c = self.tfs[doc_id]
                if conjunctive and not all(t in c for t in terms):
                    continue
                score = 0.0
                hit = False
                for t in terms:  # ascending-term summation order
                    tf = c.get(t, 0)
                    if tf == 0:
                        continue
                    hit = True
                    dl = self.doc_len[doc_id]
                    tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                    score += qtf[t] * self.idf(t) * tfn
                if hit:
                    rows.append((doc_id, score))
        rows.sort(key=lambda r: (-r[1], r[0]))
        out = pd.DataFrame(rows[:k], columns=["doc_id", "score"])
        out["rank"] = range(1, len(out) + 1)
        out["conv_id"] = (
            self.docs["conv_id"].iloc[out["doc_id"]].to_numpy()
            if len(out)
            else pd.Series([], dtype=object)
        )
        return out
