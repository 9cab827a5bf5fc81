"""BAM/BGZF output: independent re-parse must reproduce the SAM fields
(reference writes SAM or BAM via BamFileOut — src/mapper_writer.h [U])."""

import gzip
import io
import struct

import numpy as np

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.io.bam import BGZF_EOF, BamWriter
from dream_yara_tpu.io.readstore import ReadBatch
from dream_yara_tpu.io.seqstore import SeqStore
from dream_yara_tpu.pipeline.dis_mapper import DreamIndex, dream_map_sam
from dream_yara_tpu.utils.alphabet import revcomp
from dream_yara_tpu.utils.options import MapperOptions
from tests.conftest import mutate, random_text

_OPS = "MIDNSHP=X"
_NIB = "=ACMGRSVTWYHKDBN"


def decode_bam(data: bytes):
    """Independent minimal BAM reader (struct + gzip only)."""
    assert data.endswith(BGZF_EOF)
    # BGZF blocks are valid gzip members; validate BSIZE bookkeeping too
    raw = io.BytesIO()
    off = 0
    while off < len(data):
        assert data[off : off + 4] == b"\x1f\x8b\x08\x04"
        xlen = struct.unpack("<H", data[off + 10 : off + 12])[0]
        extra = data[off + 12 : off + 12 + xlen]
        assert extra[:4] == b"BC\x02\x00"
        bsize = struct.unpack("<H", extra[4:6])[0] + 1
        raw.write(gzip.decompress(data[off : off + bsize]))
        off += bsize
    buf = raw.getvalue()
    assert buf[:4] == b"BAM\x01"
    p = 4
    l_text = struct.unpack("<i", buf[p : p + 4])[0]
    header = buf[p + 4 : p + 4 + l_text].decode().rstrip("\n")
    p += 4 + l_text
    n_ref = struct.unpack("<i", buf[p : p + 4])[0]
    p += 4
    refs = []
    for _ in range(n_ref):
        ln = struct.unpack("<i", buf[p : p + 4])[0]
        name = buf[p + 4 : p + 4 + ln - 1].decode()
        refs.append((name, struct.unpack("<i", buf[p + 4 + ln : p + 8 + ln])[0]))
        p += 8 + ln
    recs = []
    while p < len(buf):
        bs = struct.unpack("<i", buf[p : p + 4])[0]
        r = buf[p + 4 : p + 4 + bs]
        p += 4 + bs
        (ref_id, pos, lrn, mapq, _bin, ncig, flag, lseq, nref, npos,
         tlen) = struct.unpack("<iiBBHHHiiii", r[:32])
        q = 32
        qname = r[q : q + lrn - 1].decode()
        q += lrn
        cig = struct.unpack(f"<{ncig}I", r[q : q + 4 * ncig])
        q += 4 * ncig
        cigar = "".join(f"{c >> 4}{_OPS[c & 15]}" for c in cig) or "*"
        nib = r[q : q + (lseq + 1) // 2]
        q += (lseq + 1) // 2
        seq = ""
        for i in range(lseq):
            b = nib[i // 2]
            seq += _NIB[(b >> 4) if i % 2 == 0 else (b & 15)]
        qual = r[q : q + lseq]
        q += lseq
        qstr = ("*" if lseq and qual[0] == 0xFF
                else "".join(chr(c + 33) for c in qual))
        tags = []
        while q < len(r):
            tag = r[q : q + 2].decode()
            typ = chr(r[q + 2])
            q += 3
            if typ == "i":
                val = str(struct.unpack("<i", r[q : q + 4])[0]); q += 4
            elif typ == "A":
                val = chr(r[q]); q += 1
            elif typ == "f":
                val = str(struct.unpack("<f", r[q : q + 4])[0]); q += 4
            else:
                e = r.index(b"\x00", q)
                val = r[q:e].decode(); q = e + 1
                typ = "Z"
            tags.append(f"{tag}:{typ}:{val}")
        rname = refs[ref_id][0] if ref_id >= 0 else "*"
        if nref == -1:
            rnext = "*"
        elif nref == ref_id and ref_id >= 0:
            rnext = "="
        else:
            rnext = refs[nref][0]
        recs.append([qname, str(flag), rname, str(pos + 1), str(mapq), cigar,
                     rnext, str(npos + 1), str(tlen),
                     seq if lseq else "*", qstr if lseq else "*"] + tags)
    return header, refs, recs


def test_bam_roundtrip_matches_sam(rng):
    B = 2
    genomes = [random_text(rng, 5000) for _ in range(B)]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text) for st in stores]
    index = DreamIndex(stores, fms, None, "none")
    names, reads = [], []
    for b, g in enumerate(genomes):
        for i in range(6):
            p = int(rng.integers(0, 4800))
            r = mutate(rng, g[p : p + 100].copy(), n_sub=1)
            if i % 2:
                r = revcomp(r)
            names.append(f"b{b}r{i}")
            reads.append(r)
    names.append("junk")
    reads.append(random_text(rng, 100))  # unmapped record
    batch = ReadBatch.from_reads(names, reads)
    opts = MapperOptions(error_rate=0.03, secondary_matches="tag")
    sam = dream_map_sam(index, batch, opts, cmdline="bam test").decode()

    buf = io.BytesIO()
    w = BamWriter(buf)
    w.write_sam(sam)
    w.f.write(BGZF_EOF)
    header, refs, recs = decode_bam(buf.getvalue())

    sam_lines = [l for l in sam.splitlines() if l]
    want_header = [l for l in sam_lines if l.startswith("@")]
    want_recs = [l.split("\t") for l in sam_lines if not l.startswith("@")]
    assert header.splitlines() == want_header
    assert [n for n, _ in refs] == [l.split("\t")[1][3:] for l in want_header
                                    if l.startswith("@SQ")]
    assert len(recs) == len(want_recs)
    for got, want in zip(recs, want_recs):
        # RNEXT/PNEXT of fully-unmapped records: '*'/0 in SAM -> -1/-1 in
        # BAM and back to '*'/'0'; normalize the POS-0 spelling
        w2 = list(want)
        if w2[3] == "0":
            got[3] = "0" if got[3] == "0" else got[3]
        assert got[:6] == w2[:6], (got, w2)
        assert got[8] == w2[8]
        assert got[9] == w2[9] and got[10] == w2[10]
        assert got[11:] == w2[11:], (got[11:], w2[11:])


def test_bgzf_blocks_and_eof(rng):
    from dream_yara_tpu.io.bam import bgzf_compress

    data = bytes(rng.integers(0, 256, 200_000, dtype=np.uint8))
    blob = bgzf_compress(data)
    # multi-block (>64K input), every block independently gzip-decodable
    out, off, nblocks = b"", 0, 0
    while off < len(blob):
        xlen = struct.unpack("<H", blob[off + 10 : off + 12])[0]
        bsize = struct.unpack("<H", blob[off + 16 : off + 18])[0] + 1
        out += gzip.decompress(blob[off : off + bsize])
        off += bsize
        nblocks += 1
    assert out == data and nblocks >= 4
    assert gzip.decompress(BGZF_EOF) == b""
