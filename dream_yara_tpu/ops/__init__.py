from .device_index import DeviceFM, DeviceFMSet
from .rank import rank, lf_step
from .backward_search import backward_search, gather_hits
from .verify import banded_verify
from .ibf_query import ibf_bin_counts, ibf_candidates, kmer_windows_dev
