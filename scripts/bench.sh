#!/bin/sh
# Bench launcher that keeps the one-line JSON contract machine-readable:
# sbt runs at -error log level so its own [info]/[success] trailers are
# suppressed and the bench's final println is the LAST stdout line.
# graft.Bench also writes the identical line to bench_results.json in
# the working directory, so a consumer that truncates stdout can still
# recover the full per-query map from the file.
#
# Usage (same env contract as running graft.Bench directly):
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 scripts/bench.sh
cd "$(dirname "$0")/.." || exit 1
exec sbt -batch -error "runMain graft.Bench"
