"""Miner library: the reference's UDF surface, re-expressed in Python.

Importing this package registers all built-in miners (the analogue of the
reference's ``meta[]`` + ``add_miner_so`` plugin discovery,
``/root/reference/src/extractor.c:307-401``)."""

from nativeextractor_ray.miners.base import (
    Miner,
    filter_enclosed,
    make_miner,
    register_miner,
    registered_miners,
    run_miners,
    scan,
    sort_occurrences,
)
from nativeextractor_ray.miners.builtin import (
    DateMiner,
    EmailMiner,
    NumberMiner,
    PhoneMiner,
    UrlMiner,
)
from nativeextractor_ray.miners.csv_cell import CsvCellMiner
from nativeextractor_ray.miners.glob import GlobMiner, is_glob
from nativeextractor_ray.miners.ner import DictionaryMiner
from nativeextractor_ray.miners.regexlang import CompiledRegex, RegexMiner

__all__ = [
    "Miner",
    "GlobMiner",
    "RegexMiner",
    "CompiledRegex",
    "DictionaryMiner",
    "EmailMiner",
    "UrlMiner",
    "DateMiner",
    "PhoneMiner",
    "NumberMiner",
    "CsvCellMiner",
    "is_glob",
    "filter_enclosed",
    "make_miner",
    "register_miner",
    "registered_miners",
    "run_miners",
    "scan",
    "sort_occurrences",
]
