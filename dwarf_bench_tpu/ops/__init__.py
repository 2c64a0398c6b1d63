from . import (
    bucket_hash,
    csr_join,
    cuckoo,
    groupby,
    hashing,
    hashtable,
    join,
    primitives,
    reduce,
    scan,
    scan_pallas,
    sort,
)

__all__ = [
    "bucket_hash",
    "csr_join",
    "cuckoo",
    "groupby",
    "hashing",
    "hashtable",
    "join",
    "primitives",
    "reduce",
    "scan",
    "scan_pallas",
    "sort",
]
