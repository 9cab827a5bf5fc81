from .mapper import BinMapper, map_single_bin, single_bin_sam
from .matches import Matches, Ranked, build_matches, dedup_matches, rank_matches
from .mapq import compute_mapq
from .cigar import compute_cigars
from .writer import GlobalContigs, sam_header, write_se_records
