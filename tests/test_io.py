import numpy as np

from dream_yara_tpu.io import (
    FastqBatchReader, ReadBatch, SeqStore, read_fasta, read_fastq, write_fasta,
)
from dream_yara_tpu.utils.alphabet import SENTINEL, decode, encode, revcomp


def test_fasta_roundtrip(tmp_path):
    names = ["chr1", "chr2"]
    seqs = [encode("ACGTACGTACGT"), encode("TTTTNNAC")]
    path = tmp_path / "ref.fa"
    write_fasta(path, names, seqs, width=5)
    names2, seqs2 = read_fasta(path)
    assert names2 == names
    for a, b in zip(seqs, seqs2):
        assert np.array_equal(a, b)


def test_fasta_gz_and_multiline(tmp_path):
    path = tmp_path / "ref.fa.gz"
    write_fasta(path, ["c with desc"], [encode("ACGT" * 50)], width=7)
    names, seqs = read_fasta(path)
    assert names == ["c"]
    assert decode(seqs[0]) == "ACGT" * 50


def test_fastq(tmp_path):
    path = tmp_path / "r.fq"
    with open(path, "wb") as fh:
        fh.write(b"@r1 extra\nACGT\n+\nIIII\n@r2\nTTTTT\n+\nJJJJJ\n")
    names, seqs, quals = read_fastq(path)
    assert names == ["r1", "r2"]
    assert decode(seqs[0]) == "ACGT"
    assert quals[1] == b"JJJJJ"


def test_fastq_batch_reader_paired(tmp_path):
    p1, p2 = tmp_path / "1.fq", tmp_path / "2.fq"
    recs1 = b"".join(b"@a%d\nACGT\n+\nIIII\n" % i for i in range(5))
    recs2 = b"".join(b"@b%d\nTTTT\n+\nIIII\n" % i for i in range(5))
    p1.write_bytes(recs1)
    p2.write_bytes(recs2)
    batches = list(FastqBatchReader(p1, p2, batch_size=4))
    assert [b.n_reads for b in batches] == [4, 4, 2]
    b0 = batches[0]
    assert b0.paired
    assert b0.names == ["a0", "a1", "b0", "b1"]
    assert b0.mate_id(0) == 2 and b0.mate_id(3) == 1


def test_readbatch_layout():
    seqs = [encode("ACGT"), encode("GGA")]
    b = ReadBatch.from_reads(["x", "y"], seqs, paired=False)
    assert b.seqs.shape == (4, 4)
    assert np.array_equal(b.seqs[0], encode("ACGT"))
    assert decode(b.seqs[1]) == "GGAN"                      # padded with N
    assert np.array_equal(b.seqs[2], revcomp(encode("ACGT")))
    assert np.array_equal(b.seqs[3, :3], revcomp(encode("GGA")))
    assert b.seq_row(1, reverse=True) == 3


def test_seqstore():
    seqs = [encode("ACGTA"), encode("GG")]
    st = SeqStore.from_seqs(["c1", "c2"], seqs)
    assert st.text[5] == SENTINEL and st.text[-1] == SENTINEL
    assert len(st.text) == 5 + 2 + 2
    assert st.global_to_local(0) == (0, 0)
    assert st.global_to_local(4) == (0, 4)
    assert st.global_to_local(6) == (1, 0)
    assert list(st.contig_of(np.array([0, 4, 6, 7]))) == [0, 0, 1, 1]


def test_seqstore_save_load(tmp_path):
    st = SeqStore.from_seqs(["c1"], [encode("ACGTNACGT")])
    st.save(tmp_path / "store")
    st2 = SeqStore.load(tmp_path / "store")
    assert st2.names == ["c1"]
    assert np.array_equal(st2.text, st.text)
