"""Q2: multi-token synonym windows — query rewriting to variant token
vectors, searched alongside the original query and merged by max score.

Reference semantics (``/root/reference/src/collection.cpp:1929-2064``,
``synonym_t`` at ``include/collection.h:101-128``; behavioral targets in
``test/collection_synonyms_test.cpp``):

- a rule is either one-way (``root`` token window → each of
  ``synonyms``) or multi-way (empty root: every vector in ``synonyms``
  maps to every OTHER vector in the group);
- reduction slides windows from widest to narrowest over the token
  vector, rewrites the first matching window, and recurses on the
  rewritten vector (so chained rules compose, e.g. "new york"→"nyc"
  then "t shirt"→"tshirt");
- hashes of every consumed window/replacement (and their individual
  tokens) are marked processed, so a rule never re-fires on its own
  output and expansion/compression rule pairs don't ping-pong;
- the recursion's leaves (vectors where no further rule fired) are the
  variant queries; the original vector is always searched too
  (``src/index.cpp:1443-1487`` runs search_field once for the original
  and once per variant into the same topster).

This re-derivation uses token TUPLES where the reference uses wyhash
values (``StringUtils::hash_wy`` + ``Index::hash_combine``) — identity
on token sequences, minus the hash collisions; iteration order mirrors
the reference's insertion-ordered vectors, so the golden vectors from
``collection_synonyms_test.cpp`` reproduce exactly (see
``tests/test_synonyms.py``).

Scale note: rules are a driver-side dict (the reference holds them in
memory per collection, typically O(10³)); reduction is pure string
work on the ≤16-token query — no Spark job. Variant scoring reuses the
engine's set plan, so the per-variant cost is one more branch in the
same candidate-postings decode.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field


@dataclass(frozen=True)
class SynonymRule:
    """``synonym_t``: one-way when ``root`` is non-empty, else multi-way."""

    id: str
    root: tuple[str, ...] = ()
    synonyms: tuple[tuple[str, ...], ...] = ()


class SynonymStore:
    """Insertion-ordered rule store with the reference's window index
    (window token-tuple → rule ids; ``add_synonym``,
    ``src/collection.cpp:1933-1961``). Upserting an existing id replaces
    the old rule."""

    def __init__(self, rules: list[SynonymRule] | tuple[SynonymRule, ...] = ()):
        self._rules: dict[str, SynonymRule] = {}
        self._index: dict[tuple[str, ...], list[str]] = {}
        for r in rules:
            self.add(r)

    def add(self, rule: SynonymRule) -> None:
        if rule.id in self._rules:
            self.remove(rule.id)
        self._rules[rule.id] = rule
        if rule.root:
            self._index.setdefault(tuple(rule.root), []).append(rule.id)
        else:
            for syn in rule.synonyms:
                self._index.setdefault(tuple(syn), []).append(rule.id)

    def remove(self, rule_id: str) -> None:
        rule = self._rules.pop(rule_id, None)
        if rule is None:
            return
        keys = [tuple(rule.root)] if rule.root else [tuple(s) for s in rule.synonyms]
        for k in keys:
            ids = self._index.get(k, [])
            if rule_id in ids:
                ids.remove(rule_id)
            if not ids:
                self._index.pop(k, None)

    def get(self, rule_id: str) -> SynonymRule | None:
        return self._rules.get(rule_id)

    def rules(self) -> list[SynonymRule]:
        return list(self._rules.values())

    def __len__(self) -> int:
        return len(self._rules)


def synonym_reduction(
    tokens: list[str], store: SynonymStore
) -> list[list[str]]:
    """Token vector → variant vectors (NOT including the original),
    mirroring ``Collection::synonym_reduction``."""
    results: list[list[str]] = []
    processed: set[tuple[str, ...]] = set()
    _reduce(list(tokens), len(tokens), 0, processed, results, store)
    return results


def _reduce(
    tokens: list[str],
    start_window_size: int,
    start_index_pos: int,
    processed: set[tuple[str, ...]],
    results: list[list[str]],
    store: SynonymStore,
) -> None:
    recursed = False
    for window_len in range(start_window_size, 0, -1):
        for start_index in range(start_index_pos, len(tokens) - window_len + 1):
            window = tuple(tokens[start_index : start_index + window_len])
            rule_ids = store._index.get(window)
            if rule_ids and window not in processed:
                for rule_id in list(rule_ids):
                    rule = store._rules[rule_id]
                    for syn_def in rule.synonyms:
                        if tuple(syn_def) == window:
                            continue  # token group matching itself
                        new_tokens = (
                            tokens[:start_index]
                            + list(syn_def)
                            + tokens[start_index + window_len :]
                        )
                        processed.add(tuple(syn_def))
                        processed.add(window)
                        processed.update((t,) for t in syn_def)
                        processed.update((t,) for t in window)
                        recursed = True
                        _reduce(
                            new_tokens, window_len, start_index,
                            processed, results, store,
                        )
        start_index_pos = 0  # next window size starts from scratch
    if not recursed and processed:
        results.append(tokens)
