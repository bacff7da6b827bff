#!/bin/bash
cd /root/repo
uptime > /tmp/repin_loadavg_start.txt
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
  sbt -batch 'runMain graft.Bench' > /tmp/repin_bench_stdout.txt 2>/tmp/repin_bench_stderr.txt
uptime > /tmp/repin_loadavg_end.txt
touch /tmp/repin_done
