"""Reference-compatible command line: ``python -m sph_bvf_tpu -in X.lmp``.

Mirrors the flag surface of the reference's `lmp` binary (main.cpp:35,
lammps.cpp:112-192) so the published run commands translate directly:

    mpirun -np 4 lmp_mpi -in cavity.lmp -var nx 100 -log log.cavity
  ->                python -m sph_bvf_tpu -in cavity.lmp -var nx 100 -log log.cavity

Flags:
  -in/-i FILE      input script (required; the reference reads stdin too —
                   pass "-" for that)
  -var/-v N V      override `variable N equal ...` (repeatable)
  -log/-l FILE     append thermo rows to FILE ("none" disables the file)
  -echo/-e MODE    none|screen — echo parsed script lines (input.cpp:151)
  -sf/-suffix S    accepted and ignored: accelerator variants are native
                   here (the Pallas kernel path replaces /omp and /gpu)
  -partition       rejected with a pointer to parallel/ensemble.py (the
                   `universe` analog is vmapped ensembles, not processes)

Extras beyond the reference CLI (both optional): --max-steps caps the
`run N` directive, --out sets the dump/restart output directory.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="python -m sph_bvf_tpu",
        description="Run a LAMMPS-style SPH-BVF input script on TPU.",
    )
    ap.add_argument("-in", "-i", dest="infile", required=True,
                    help="input script (.lmp), or - for stdin")
    ap.add_argument("-var", "-v", nargs=2, action="append", default=[],
                    metavar=("NAME", "VALUE"), dest="var")
    ap.add_argument("-log", "-l", dest="log", default=None,
                    help="thermo log file ('none' for screen only)")
    ap.add_argument("-echo", "-e", dest="echo", default="none",
                    choices=("none", "screen", "log", "both"))
    ap.add_argument("-sf", "-suffix", dest="suffix", default=None,
                    help="accepted and ignored (kernels are native)")
    ap.add_argument("-partition", dest="partition", default=None)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--out", default="out")
    args = ap.parse_args(argv)

    if args.partition is not None:
        ap.error("-partition: use sph_bvf_tpu.parallel.ensemble (vmapped "
                 "replica runs) instead of process partitions")

    from sph_bvf_tpu.api.lmp import parse_script

    if args.infile == "-":
        text = sys.stdin.read()
    else:
        with open(args.infile) as f:
            text = f.read()

    log_file = None if args.log in (None, "none") else args.log
    if args.echo in ("screen", "both"):
        for line in text.splitlines():
            print(line)
    if args.echo in ("log", "both") and log_file:
        with open(log_file, "a") as f:
            f.write(text if text.endswith("\n") else text + "\n")

    overrides = {k: float(v) for k, v in args.var}
    model = parse_script(text, overrides=overrides)
    state, params, spec = model.run(
        max_steps=args.max_steps, out_dir=args.out, log_file=log_file,
    )
    print(f"done: step {int(state.step)}, {int(state.n_valid)} particles, "
          f"output in {args.out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
