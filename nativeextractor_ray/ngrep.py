"""ngrep — entity grep over text files, the CLI parity tool for the
reference's ``ngrep`` example (``/root/reference/src/example/ngrep.c``):
compile a regex / glob / dictionary miner once, scan files, print
occurrences as plain / NDJSON / CSV.

    python -m nativeextractor_ray.ngrep -r '[0-9]+' /path/*.txt
    python -m nativeextractor_ray.ngrep -g '*kle' --format json dir/
    python -m nativeextractor_ray.ngrep -d dict.csv file.txt

The reference compiles the regex to a native .so and dlopens it
(ngrep.c:91-171); here the compile-once economics is the MinerPool actor
``__init__``.  Owns its Ray session (guarded)."""

from __future__ import annotations

import argparse
import csv
import json
import sys


def build_specs(args) -> list:
    specs = []
    if args.regex:
        specs.append(("regex", (args.regex,), {"label": args.label or args.regex}))
    if args.glob:
        specs.append(("glob", (args.glob,), {}))
    if args.dictionary:
        import pyarrow.csv as pacsv

        tbl = pacsv.read_csv(
            args.dictionary,
            read_options=pacsv.ReadOptions(autogenerate_column_names=True),
        )
        words = [w for col in tbl.columns for w in col.to_pylist() if w]
        specs.append(("ner", (words,), {"label": args.label or "Dict"}))
    return specs


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("paths", nargs="+", help="text files or directories")
    ap.add_argument("-r", "--regex", help="regex miner (reference dialect)")
    ap.add_argument("-g", "--glob", help="glob miner pattern")
    ap.add_argument("-d", "--dictionary", help="CSV dictionary → trie NER miner")
    ap.add_argument("-l", "--label", help="label for the miner")
    ap.add_argument("--format", choices=("plain", "json", "csv"), default="plain")
    ap.add_argument("--no-enclosed", action="store_true",
                    help="drop occurrences enclosed in longer ones")
    args = ap.parse_args(argv)

    specs = build_specs(args)
    if not specs:
        ap.error("need at least one of -r / -g / -d")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from nativeextractor_ray.sources.textcorpus import text_corpus_dataset
    from nativeextractor_ray.stages.miner_pool import MinerPool

    ds = text_corpus_dataset(args.paths)
    mentions = ds.map_batches(
        MinerPool,
        fn_constructor_args=(specs,),
        fn_constructor_kwargs={"no_enclosed": args.no_enclosed,
                               "carry": ("chunk_offset",)},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )

    n = 0
    # RFC-4180 escaping for EVERY field (paths can contain commas/quotes,
    # not just the surface) — parity with the reference's escape_csv
    csv_out = csv.writer(sys.stdout, lineterminator="\n", quoting=csv.QUOTE_MINIMAL)
    for batch in mentions.iter_batches(batch_size=4096, batch_format="pyarrow"):
        rows = batch.to_pylist()
        for r in rows:
            # file-global byte position for chunked giant files (upos stays
            # chunk-local: a global codepoint offset would need a prefix sum
            # over chunk codepoint counts, which grep-style output doesn't)
            r["pos"] = r["pos"] + r.get("chunk_offset", 0)
            if args.format == "json":
                print(json.dumps({
                    "file": r["conv_id"], "pos": r["pos"], "upos": r["upos"],
                    "len": r["len"], "ulen": r["ulen"],
                    "surface": r["surface"], "label": r["label"],
                    "prob": r["prob"],
                }))
            elif args.format == "csv":
                csv_out.writerow(
                    [r["conv_id"], r["pos"], r["len"], r["surface"], r["label"]]
                )
            else:
                print(f'{r["conv_id"]}:{r["pos"]};{r["len"]};{r["surface"]};{r["label"]}')
            n += 1
    print(f"# {n} occurrences", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
