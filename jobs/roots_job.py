"""spark-submit entry point mirroring the reference ``roots`` tool
(ref:roots.c:232-268, usage ref:roots.yuck:1-3).

CLI parity mode — coefficients on the command line, roots on stdout in
the reference's exact format (real roots one per line, then conjugate
pairs as "re + imi" / "re - imi"):

    spark-submit jobs/roots_job.py -- 2 -3 1        # roots of 2 - 3x + x^2

Distributed table mode — one polynomial per row (array<double> monomial
coefficients), roots as exploded rows; this is the Spark-first shape
the CLI tool cannot offer (roots of millions of per-key AR
characteristic polynomials in one job):

    spark-submit --py-files tits_spark.zip jobs/roots_job.py \
        --input /data/polys.parquet --id-col key --coef-col coefs \
        --output /data/roots

Table mode runs the Laguerre+deflation kernel (functions/kernels.py,
ref:roots.c:162-203) inside applyInPandas batches — no driver-side
loop, scales with partitions.
"""

from __future__ import annotations

import argparse
import sys


def print_roots_cli(coefs: list[float]) -> None:
    """Reference-format output (ref:roots.c:252-262)."""
    import numpy as np

    from tits_spark.functions.kernels import roots

    reals, pairs = roots(np.asarray(coefs, dtype=np.float64))
    for r in reals:
        print(f"{r:f}")
    for re, im in pairs:
        print(f"{re:f} + {im:f}i")
        print(f"{re:f} - {im:f}i")


ROOTS_SCHEMA = "id string, root_idx int, re double, im double"


def roots_table(df, id_col: str = "id", coef_col: str = "coefs"):
    """(id, coefs: array<double>) -> (id, root_idx, re, im) rows; each
    conjugate pair emits both members, real roots first — the same
    ordering contract as the CLI. mapInPandas: many polynomials per
    Arrow batch, zero driver involvement."""
    import numpy as np
    import pandas as pd

    from tits_spark.functions.kernels import roots as _roots

    def fn(batches):
        for pdf in batches:
            ids, idxs, res, ims = [], [], [], []
            for pid, coefs in zip(pdf[id_col], pdf[coef_col]):
                try:
                    reals, pairs = _roots(np.asarray(coefs, dtype=np.float64))
                except ValueError:
                    continue  # degenerate polynomial: no roots emitted
                k = 0
                for r in reals:
                    ids.append(pid); idxs.append(k); res.append(float(r)); ims.append(0.0)
                    k += 1
                for re, im in pairs:
                    ids.append(pid); idxs.append(k); res.append(re); ims.append(im)
                    k += 1
                    ids.append(pid); idxs.append(k); res.append(re); ims.append(-im)
                    k += 1
            yield pd.DataFrame({"id": ids, "root_idx": idxs, "re": res, "im": ims})

    return df.select(
        df[id_col].cast("string").alias(id_col), coef_col
    ).mapInPandas(fn, schema=ROOTS_SCHEMA)


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:  # CLI parity mode: everything after -- is a coefficient
        cut = argv.index("--")
        coefs = [float(x) for x in argv[cut + 1:]]
        if coefs:
            print_roots_cli(coefs)
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="id")
    ap.add_argument("--coef-col", default="coefs")
    ap.add_argument("--cores", default="inherit")
    args = ap.parse_args(argv)

    from tits_spark.session import get_spark

    spark = get_spark("tits_spark-roots", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    df = spark.read.parquet(args.input)
    roots_table(df, args.id_col, args.coef_col).write.mode("overwrite").parquet(
        args.output
    )


if __name__ == "__main__":
    main()
