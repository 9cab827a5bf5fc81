"""Field-by-field SAM differ (io/samdiff.py) — the parity audit tool must
itself be trustworthy: identical inputs report identical, and each class of
divergence (field value, missing record, secondary ordering) is localized
to the right counter."""

from dream_yara_tpu.io.samdiff import diff_sam

SAM_A = "\n".join([
    "@HD\tVN:1.6\tSO:unsorted",
    "@SQ\tSN:c0\tLN:5000",
    "r0\t0\tc0\t101\t40\t100M\t*\t0\t0\tACGT\tIIII\tNM:i:1"
    "\tXA:Z:c0,+200,100M,2;",
    "r1\t16\tc0\t301\t20\t50M1I49M\t*\t0\t0\tACGT\tIIII\tNM:i:2",
    "r2\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII",
    "r3\t0\tc0\t401\t40\t100M\t*\t0\t0\tACGT\tIIII\tNM:i:0",
    "r3\t256\tc0\t601\t0\t100M\t*\t0\t0\t*\t*\tNM:i:1",
    "r3\t256\tc0\t701\t0\t100M\t*\t0\t0\t*\t*\tNM:i:1",
]) + "\n"


def test_identical():
    d = diff_sam(SAM_A, SAM_A)
    assert d.identical
    assert d.n_a == d.n_b == 6
    assert "IDENTICAL" in d.report()


def test_field_mismatch_localized():
    b = SAM_A.replace("r0\t0\tc0\t101\t40", "r0\t0\tc0\t101\t37")
    d = diff_sam(SAM_A, b)
    assert not d.identical
    assert d.field_mismatches["MAPQ"] == 1
    assert set(d.field_mismatches) == {"MAPQ"}
    ex = d.examples["MAPQ"][0]
    assert ex[0][0] == "r0" and ex[1] == 40 and ex[2] == 37
    assert "MAPQ: 1 mismatches" in d.report()


def test_cigar_and_nm_counted_separately():
    b = SAM_A.replace("50M1I49M", "49M1I50M").replace("NM:i:2", "NM:i:3")
    d = diff_sam(SAM_A, b)
    assert d.field_mismatches["CIGAR"] == 1
    assert d.field_mismatches["NM"] == 1
    assert "MAPQ" not in d.field_mismatches


def test_missing_and_extra_records():
    lines = [l for l in SAM_A.splitlines() if not l.startswith("r2")]
    b = "\n".join(lines) + "\nrX\t0\tc0\t901\t40\t100M\t*\t0\t0\tNM:i:0\n"
    d = diff_sam(SAM_A, b)
    assert len(d.only_a) == 1 and d.only_a[0][0] == "r2"
    assert len(d.only_b) == 1 and d.only_b[0][0] == "rX"


def test_secondary_ordering():
    lines = SAM_A.splitlines()
    # swap the two secondary records of r3 — same set, different order
    lines[-2], lines[-1] = lines[-1], lines[-2]
    d = diff_sam(SAM_A, "\n".join(lines) + "\n")
    assert d.ordering_diffs == 1
    assert not d.field_mismatches
    assert d.ordering_examples[0] == ("r3", 0)


def test_strand_is_identity_not_mismatch():
    # A record at the same pos on the other strand is a DIFFERENT alignment
    # site (missing+extra), not a FLAG field mismatch.
    b = SAM_A.replace("r1\t16", "r1\t0")
    d = diff_sam(SAM_A, b)
    assert len(d.only_a) == 1 and len(d.only_b) == 1
    assert "FLAG" not in d.field_mismatches


def test_extra_tag_mismatch():
    b = SAM_A.replace(
        "r3\t0\tc0\t401\t40\t100M\t*\t0\t0\tACGT\tIIII\tNM:i:0",
        "r3\t0\tc0\t401\t40\t100M\t*\t0\t0\tACGT\tIIII\tNM:i:0\tRG:Z:x")
    d = diff_sam(SAM_A, b)
    assert d.field_mismatches["RG"] == 1
