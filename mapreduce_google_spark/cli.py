"""Job-submission CLI — the engine's counterpart of the reference's
``mapreduce-submit`` client (``mapreduce/submit.py:21-60``).

Two modes:

1. Reference-style streaming-exec job (the reference's whole surface):

   python -m mapreduce_google_spark.cli exec \\
       --input DIR --output DIR \\
       --mapper ./map.py --reducer ./reduce.py --num-reducers 4

   Reads the input directory as text lines, pipes through the executables
   with reference dataflow parity (md5 partition, sorted runs), writes
   ``part-*`` text files — a drop-in for the reference job descriptor
   {input_directory, output_directory, mapper_executable,
   reducer_executable, num_mappers, num_reducers}. num_mappers is
   intentionally absent: input splitting is Spark's job now.

2. Declared-query run:

   python -m mapreduce_google_spark.cli query --name t08_pricing_summary \\
       --sf-dir /root/testdata/sf0.01 [--output DIR]

Unlike the reference's fire-and-forget TCP submit (``submit.py:92-94``,
completion observed by polling output files), this CLI runs the job in
process and exits non-zero on failure.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="mapreduce_google_spark")
    sub = parser.add_subparsers(dest="mode", required=True)

    p_exec = sub.add_parser("exec", help="reference-style mapper/reducer job")
    p_exec.add_argument("--input", required=True, help="input text directory")
    p_exec.add_argument("--output", required=True, help="output directory")
    p_exec.add_argument("--mapper", required=True, help="mapper executable")
    p_exec.add_argument("--reducer", required=True, help="reducer executable")
    p_exec.add_argument("--num-reducers", type=int, default=4)

    p_query = sub.add_parser("query", help="run a declared registry query")
    p_query.add_argument("--name", required=True)
    p_query.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_query.add_argument("--output", help="write parquet here instead of stdout")
    p_query.add_argument("--limit", type=int, default=20)

    args = parser.parse_args(argv)

    from mapreduce_google_spark.io import read_text_dir, write_text_dir
    from mapreduce_google_spark.operators.pipe import pipe_map_reduce
    from mapreduce_google_spark.queries import REGISTRY
    from mapreduce_google_spark.session import get_spark

    spark = get_spark(app_name=f"mgs-cli-{args.mode}")
    try:
        if args.mode == "exec":
            lines = read_text_dir(spark, args.input)
            kv = pipe_map_reduce(
                lines, args.mapper, args.reducer, num_reducers=args.num_reducers
            )
            out = kv.select(
                F.concat_ws("\t", F.col("key"), F.col("value")).alias("value")
            )
            write_text_dir(out, args.output, num_files=args.num_reducers)
            print(f"wrote {args.output}")
        else:
            if args.name not in REGISTRY:
                print(
                    f"unknown query {args.name!r}; known: {sorted(REGISTRY)}",
                    file=sys.stderr,
                )
                return 2
            df = REGISTRY[args.name].builder(spark, args.sf_dir)
            if args.output:
                df.write.mode("overwrite").parquet(args.output)
                print(f"wrote {args.output}")
            else:
                df.show(args.limit, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
