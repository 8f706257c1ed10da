"""ES/Lucene query-string parsing — the ``simple_query_string``
grammar subset a search box sends, compiled by
``QueryEngine.top_k_query_string`` onto the composable ``Bool``
machinery (one pruned block-max job for term/prefix queries).

Reference semantics: the free-text queries the reference's UI routes
to Elasticsearch (`ElasticOperations.scala:32-76` wraps them in bool
queries; `README.md:89-90`).  Grammar (Lucene SimpleQueryParser
subset)::

    query  := item ( ws item )*
    item   := [ '+' | '-' ] atom ( '|' atom )* [ '^' number ]
    atom   := [ field ':' ] ( '"' phrase '"' | '(' group ')' | word )
    group  := word ( ( '|' | ws ) word )*
    word   := run of non-syntax chars; trailing '*' marks a PREFIX

  * whitespace separates items; ``+`` = must, ``-`` = must_not, bare
    items go to the ``default_operator`` bucket (``"or"`` -> should
    with the ES minimum_should_match default, ``"and"`` -> must);
  * atoms joined by ``|`` (or words inside ``(...)``) form ONE match
    clause — OR within, like an ES match clause;
  * ``"..."`` is an exact phrase (positional index required to
    execute); ``field:`` scopes an item to one indexed field;
    ``^N`` boosts the whole item;
  * a trailing ``*`` marks a prefix — expanded against the term
    dictionary at query time (Lucene scoring rewrite: every expansion
    keeps its own idf).  Mid-word wildcards are NOT part of this
    grammar — use ``QueryEngine.top_k_wildcard``.

The parser is pure (no engine access): it returns ``QSItem`` rows the
compiler turns into ``Bool`` clauses.  Kept separate so tests can pin
golden parses without a SparkSession.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

_FIELD_RX = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*")
_NUM_RX = re.compile(r"[0-9]+(\.[0-9]+)?")
# chars that terminate a bare word
_WORD_END = set(' \t\r\n|()"^')


@dataclass(frozen=True)
class QSItem:
    """One parsed query-string item == one Bool clause.

    Exactly one of ``phrase`` / (``words`` + ``prefixes``) is set;
    ``words`` and ``prefixes`` together form one OR group.
    """

    occur: str                       # "must" | "should" | "must_not"
    boost: float = 1.0
    field: str | None = None
    phrase: str | None = None
    words: tuple = dc_field(default=())
    prefixes: tuple = dc_field(default=())


class QueryStringError(ValueError):
    """Malformed query string (position-annotated message)."""


def _err(msg: str, s: str, pos: int):
    raise QueryStringError(f"{msg} at position {pos}: {s!r}")


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in " \t\r\n":
        i += 1
    return i


def _scan_word(s: str, i: int):
    """One bare word starting at i -> ((text, is_prefix), next_i)."""
    j = i
    while j < len(s) and s[j] not in _WORD_END:
        j += 1
    w = s[i:j]
    is_prefix = False
    if w.endswith("*"):
        w, is_prefix = w[:-1], True
    if "*" in w or "?" in w:
        _err(
            "mid-word wildcards are not query_string syntax "
            "(only a trailing '*' prefix; use top_k_wildcard)", s, i,
        )
    if not w:
        _err("empty term", s, i)
    return (w, is_prefix), j


def _scan_group(s: str, i: int):
    """'(' already consumed: words until ')' -> (words, next_i)."""
    members = []
    while True:
        i = _skip_ws(s, i)
        if i >= len(s):
            _err("unclosed '('", s, i)
        c = s[i]
        if c == ")":
            if not members:
                _err("empty group", s, i)
            return members, i + 1
        if c == "|":
            i += 1
            continue
        if c in '("':
            _err("groups may contain only words", s, i)
        if c in "+-" and not members:
            _err("'+'/'-' are not allowed inside a group", s, i)
        m, i = _scan_word(s, i)
        members.append(m)


def _scan_atom(s: str, i: int):
    """One atom -> (dict(field, phrase, members), next_i)."""
    fieldname = None
    m = _FIELD_RX.match(s, i)
    if m and m.end() < len(s) and s[m.end()] == ":":
        nxt = m.end() + 1
        if nxt < len(s) and s[nxt] not in ' \t\r\n|)^':
            fieldname = m.group(0)
            i = nxt
    if i >= len(s):
        _err("dangling field prefix", s, i)
    c = s[i]
    if c == '"':
        j = s.find('"', i + 1)
        if j < 0:
            _err("unbalanced quote", s, i)
        phrase = s[i + 1:j].strip()
        if not phrase:
            _err("empty phrase", s, i)
        return {"field": fieldname, "phrase": phrase, "members": []}, j + 1
    if c == "(":
        members, j = _scan_group(s, i + 1)
        return {"field": fieldname, "phrase": None, "members": members}, j
    if c == ")":
        _err("unmatched ')'", s, i)
    member, j = _scan_word(s, i)
    return {"field": fieldname, "phrase": None, "members": [member]}, j


def _scan_boost(s: str, i: int):
    """Optional '^number' -> (boost_or_None, next_i)."""
    if i < len(s) and s[i] == "^":
        m = _NUM_RX.match(s, i + 1)
        if not m:
            _err("'^' needs a number", s, i)
        b = float(m.group(0))
        if b <= 0.0:
            _err("boost must be > 0", s, i)
        return b, m.end()
    return None, i


def parse_query_string(s: str, default_operator: str = "or") -> list:
    """Parse a query string into ``QSItem`` rows (see module doc).

    ``default_operator``: the bucket for bare (unprefixed) items —
    ``"or"`` (ES default: should clauses, minimum_should_match
    defaults apply downstream) or ``"and"`` (must clauses).
    """
    if default_operator not in ("or", "and"):
        raise ValueError(
            f"default_operator must be 'or' or 'and', "
            f"got {default_operator!r}"
        )
    bare = "should" if default_operator == "or" else "must"
    items: list[QSItem] = []
    i = _skip_ws(s, 0)
    while i < len(s):
        occur = bare
        if s[i] == "+":
            occur, i = "must", i + 1
        elif s[i] == "-":
            occur, i = "must_not", i + 1
        if i >= len(s) or s[i] in " \t\r\n":
            _err("dangling '+'/'-'", s, i - 1)
        atom, i = _scan_atom(s, i)
        boost, i = _scan_boost(s, i)
        # pipe-joined atoms merge into ONE OR clause
        atoms = [atom]
        while True:
            j = _skip_ws(s, i)
            if j < len(s) and s[j] == "|":
                j = _skip_ws(s, j + 1)
                if j >= len(s):
                    _err("dangling '|'", s, j - 1)
                if s[j] in "+-":
                    _err(
                        "'+'/'-' apply to a whole item — put them "
                        "before the first atom of the '|' group", s, j,
                    )
                nxt, i = _scan_atom(s, j)
                b2, i = _scan_boost(s, i)
                if b2 is not None:
                    if boost is not None:
                        _err("one boost per '|' group", s, i - 1)
                    boost = b2
                atoms.append(nxt)
            else:
                break
        phrase = None
        fieldname = None
        words: list = []
        prefixes: list = []
        for a in atoms:
            if a["phrase"] is not None:
                if len(atoms) > 1:
                    _err("phrases cannot be '|'-joined", s, i - 1)
                phrase = a["phrase"]
            if a["field"] is not None:
                if fieldname is not None and fieldname != a["field"]:
                    _err(
                        "all atoms of a '|' group must share one "
                        "field", s, i - 1,
                    )
                fieldname = a["field"]
            for w, is_prefix in a["members"]:
                (prefixes if is_prefix else words).append(w)
        items.append(
            QSItem(
                occur=occur,
                boost=1.0 if boost is None else boost,
                field=fieldname,
                phrase=phrase,
                words=tuple(words),
                prefixes=tuple(prefixes),
            )
        )
        i = _skip_ws(s, i)
    if not items:
        raise QueryStringError(f"empty query string: {s!r}")
    if all(it.occur == "must_not" for it in items):
        raise QueryStringError(
            "query string needs at least one scoring item "
            "(must_not alone is unranked membership)"
        )
    return items
