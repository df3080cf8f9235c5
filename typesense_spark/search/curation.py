"""Q20: override/curation rules — stored query rules that force-include
docs at fixed positions and force-exclude others.

Reference semantics (``/root/reference/src/collection.cpp:427-493``
``populate_overrides``; ``override_t`` at ``include/collection.h:22-68``;
behavioral targets in ``test/collection_override_test.cpp``):

- a rule is {id, rule: {query, match: exact|contains},
  includes: [(doc_id, position)], excludes: [doc_id]};
- the search query is lowercased; a rule fires on string equality
  (exact) or substring containment (contains);
- explicit hidden hits and every firing rule's drop_hits are excluded,
  and exclusion takes precedence over inclusion;
- firing rules' add_hits pin docs at 1-based positions; explicitly
  passed pinned hits are applied last (they take precedence);
- rules are evaluated in id order (the reference stores them in a
  ``std::map`` keyed by id);
- a pinned position beyond the result count appends at the end (the
  splice in engine.search, mirroring src/collection.cpp:897-922).

Position collisions (multiple rules pinning different docs to the same
slot): the reference keeps a LIST of ids per position and, in ungrouped
search, picks only the FIRST id per position — later claimants are not
curated and appear at their organic rank ("without any grouping
parameter, only the first ID in a position should be picked and other
IDs should appear in their original positions",
test/collection_override_test.cpp:472-489; ids_per_pos = max(1,
group_limit), src/collection.cpp:570-584). resolve() implements exactly
that. Under group_by, up to group_limit claimants per position are kept
(claim order) and form a SYNTHETIC curated group spliced at that group
position — engine._grouped_curated_splice, mirroring the reference's
merge of override_result_kvs into result_group_kvs
(src/collection.cpp:890-922; expectations ported from
test/collection_override_test.cpp PinnedHitsGrouping).

Scale note: overrides are a driver-side dict (O(10²-10³) rules in
practice); resolution is pure string matching on the query — no Spark
job. The resolved (pinned, hidden) feed the engine's existing splice
and anti-filter paths.
"""

from __future__ import annotations

from dataclasses import dataclass

MATCH_EXACT = "exact"
MATCH_CONTAINS = "contains"


@dataclass(frozen=True)
class OverrideRule:
    id: str
    query: str
    match: str = MATCH_EXACT  # 'exact' | 'contains'
    add_hits: tuple[tuple[int, int], ...] = ()  # (doc_id, 1-based position)
    drop_hits: tuple[int, ...] = ()  # doc_ids

    def fires(self, query_lower: str) -> bool:
        if self.match == MATCH_EXACT:
            return self.query == query_lower
        return self.query in query_lower


class OverrideStore:
    """Id-keyed rule store; upsert replaces, resolution iterates in id
    order like the reference's std::map."""

    def __init__(self, rules: list[OverrideRule] | tuple[OverrideRule, ...] = ()):
        self._rules: dict[str, OverrideRule] = {}
        for r in rules:
            self.add(r)

    def add(self, rule: OverrideRule) -> None:
        self._rules[rule.id] = rule

    def remove(self, rule_id: str) -> None:
        self._rules.pop(rule_id, None)

    def get(self, rule_id: str) -> OverrideRule | None:
        return self._rules.get(rule_id)

    def __len__(self) -> int:
        return len(self._rules)

    def resolve(
        self,
        query: str,
        pinned: dict[int, int] | None = None,
        hidden: tuple[int, ...] = (),
        ids_per_pos: int = 1,
    ) -> tuple[dict[int, int], tuple[int, ...]]:
        """Query + explicit pins/hides → effective ({doc_id: position},
        (hidden doc_ids...)) for engine.search, mirroring
        populate_overrides' precedence: hidden > rule drops > rule adds,
        explicit pins applied last.

        ``ids_per_pos``: claimants kept per position, in claim order —
        1 for ungrouped search (first claimant wins, later ones rank
        organically, collection_override_test.cpp:472-489), and
        ``max(1, group_limit)`` under group_by (the kept claimants form
        a synthetic curated GROUP, src/collection.cpp:570-584)."""
        q = query.lower()
        excluded: list[int] = list(hidden)
        placements: dict[int, int] = {}  # doc_id -> requested position
        for rule_id in sorted(self._rules):
            rule = self._rules[rule_id]
            if not rule.fires(q):
                continue
            excluded.extend(rule.drop_hits)
            for doc_id, pos in rule.add_hits:
                if doc_id not in placements:
                    placements[doc_id] = pos
        # exclusion takes precedence over inclusion ACROSS rules too: a
        # later-sorted rule's drop retracts an earlier rule's add (else
        # the doc would come back both pinned and hidden, and the splice
        # would force-include it)
        placements = {d: p for d, p in placements.items() if d not in excluded}
        for doc_id, pos in (pinned or {}).items():
            if doc_id not in excluded:
                placements[doc_id] = pos  # explicit pins win for a doc
        taken: dict[int, int] = {}  # position -> claimants kept
        resolved: dict[int, int] = {}
        for doc_id, pos in placements.items():
            if taken.get(pos, 0) >= max(1, ids_per_pos):
                continue
            taken[pos] = taken.get(pos, 0) + 1
            resolved[doc_id] = pos
        return resolved, tuple(dict.fromkeys(excluded))
