"""Field-by-field SAM differ (VERDICT round-2 item 4).

The parity bar (SURVEY.md §2.9, ref `src/mapper_writer.h — MatchesWriter/
getMapq [U]`) is bit-identical SAM vs the reference binary. While the
reference mount stays empty that cannot be checked — but the moment it is
fixed, `tools/parity.py` must produce an *actionable* report, not a bare
"N records differ". This module diffs two SAM texts per field:

  FLAG / RNAME / POS / MAPQ / CIGAR / RNEXT / PNEXT / TLEN / NM / XA /
  missing + extra records / secondary-record ordering within a read group

so a MAPQ-ladder mismatch (the most likely divergence — pipeline/mapq.py
is self-defined) shows up as "MAPQ: 412 of 100k" instead of "everything
differs". Also used by the cross-path tests (single vs mesh vs multihost)
to localize any future regression.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass, field

FIELDS = ("FLAG", "RNAME", "POS", "MAPQ", "CIGAR",
          "RNEXT", "PNEXT", "TLEN", "NM", "XA")


@dataclass
class SamRecord:
    qname: str
    flag: int
    rname: str
    pos: int
    mapq: int
    cigar: str
    rnext: str
    pnext: int
    tlen: int
    tags: dict

    @property
    def mate(self) -> int:
        # 0 = SE/first mate, 1 = second mate
        return 1 if (self.flag & 0x80) else 0

    @property
    def is_secondary(self) -> bool:
        return bool(self.flag & 0x100)

    def key(self):
        """Identity of the alignment a record reports, independent of the
        reporting fields under test: (read, mate, secondary?, site)."""
        return (self.qname, self.mate, self.is_secondary,
                self.rname, self.pos, self.flag & 0x10)


def parse_sam(text: str | bytes) -> list[SamRecord]:
    if isinstance(text, bytes):
        text = text.decode()
    recs = []
    for line in text.splitlines():
        if not line or line.startswith("@"):
            continue
        f = line.split("\t")
        tags = {}
        for t in f[11:]:
            k, _typ, v = t.split(":", 2)
            tags[k] = v
        recs.append(SamRecord(f[0], int(f[1]), f[2], int(f[3]), int(f[4]),
                              f[5], f[6], int(f[7]), int(f[8]), tags))
    return recs


@dataclass
class SamDiff:
    n_a: int = 0
    n_b: int = 0
    matched: int = 0
    only_a: list = field(default_factory=list)
    only_b: list = field(default_factory=list)
    field_mismatches: Counter = field(default_factory=Counter)
    examples: dict = field(default_factory=dict)   # field -> [(key, a, b)]
    ordering_diffs: int = 0          # read groups whose secondary order differs
    ordering_examples: list = field(default_factory=list)

    @property
    def identical(self) -> bool:
        return (not self.only_a and not self.only_b
                and not self.field_mismatches and self.ordering_diffs == 0
                and self.n_a == self.n_b)

    def report(self, label_a: str = "ours", label_b: str = "theirs") -> str:
        if self.identical:
            return f"IDENTICAL ({self.n_a} records)"
        out = [f"{self.n_a} records ({label_a}) vs {self.n_b} ({label_b}); "
               f"{self.matched} alignment sites matched"]
        if self.only_a:
            out.append(f"  only in {label_a}: {len(self.only_a)} "
                       f"(e.g. {self.only_a[:3]})")
        if self.only_b:
            out.append(f"  only in {label_b}: {len(self.only_b)} "
                       f"(e.g. {self.only_b[:3]})")
        for fld in FIELDS:
            n = self.field_mismatches.get(fld, 0)
            if n:
                ex = self.examples.get(fld, [])[:3]
                exs = "; ".join(f"{k[0]}/m{k[1]}: {a!r} vs {b!r}"
                                for k, a, b in ex)
                out.append(f"  {fld}: {n} mismatches ({exs})")
        for tag, n in sorted(self.field_mismatches.items()):
            if tag not in FIELDS:
                out.append(f"  tag {tag}: {n} mismatches")
        if self.ordering_diffs:
            out.append(f"  secondary-record ordering: {self.ordering_diffs} "
                       f"read groups differ "
                       f"(e.g. {self.ordering_examples[:3]})")
        return "\n".join(out)


def _field_vals(r: SamRecord):
    return {"FLAG": r.flag, "RNAME": r.rname, "POS": r.pos, "MAPQ": r.mapq,
            "CIGAR": r.cigar, "RNEXT": r.rnext, "PNEXT": r.pnext,
            "TLEN": r.tlen, "NM": r.tags.get("NM"), "XA": r.tags.get("XA")}


def diff_sam(a_text: str, b_text: str, *, compare_tags: bool = True) -> SamDiff:
    """Match records by alignment site, then diff every reporting field.

    Matching key = (qname, mate, secondary?, rname, pos, strand): two
    correct mappers must agree on the *set* of reported sites (the IBF has
    no false negatives and the search is exact), so unmatched keys are
    missing/extra records, and matched keys localize per-field divergence
    (the MAPQ ladder, CIGAR conventions, tag formats, flag bits beyond
    strand)."""
    d = SamDiff()
    a_recs, b_recs = parse_sam(a_text), parse_sam(b_text)
    d.n_a, d.n_b = len(a_recs), len(b_recs)

    a_by, b_by = defaultdict(list), defaultdict(list)
    for r in a_recs:
        a_by[r.key()].append(r)
    for r in b_recs:
        b_by[r.key()].append(r)

    for k in sorted(set(a_by) | set(b_by)):
        al, bl = a_by.get(k, []), b_by.get(k, [])
        if not bl:
            d.only_a.append(k)
            continue
        if not al:
            d.only_b.append(k)
            continue
        d.matched += min(len(al), len(bl))
        for ra, rb in zip(al, bl):
            va, vb = _field_vals(ra), _field_vals(rb)
            for fld in FIELDS:
                if fld == "XA" and not compare_tags:
                    continue
                if fld == "NM" and not compare_tags:
                    continue
                if va[fld] != vb[fld]:
                    d.field_mismatches[fld] += 1
                    d.examples.setdefault(fld, [])
                    if len(d.examples[fld]) < 8:
                        d.examples[fld].append((k, va[fld], vb[fld]))
            if compare_tags:
                for tag in (set(ra.tags) | set(rb.tags)) - {"NM", "XA"}:
                    if ra.tags.get(tag) != rb.tags.get(tag):
                        d.field_mismatches[tag] += 1

    # secondary-record ordering within each (qname, mate) group
    def sec_order(recs):
        g = defaultdict(list)
        for r in recs:
            if r.is_secondary:
                g[(r.qname, r.mate)].append((r.rname, r.pos, r.flag & 0x10))
        return g

    ga, gb = sec_order(a_recs), sec_order(b_recs)
    for grp in sorted(set(ga) | set(gb)):
        la, lb = ga.get(grp, []), gb.get(grp, [])
        if la != lb and sorted(la) == sorted(lb):
            d.ordering_diffs += 1
            if len(d.ordering_examples) < 8:
                d.ordering_examples.append(grp)
    return d
