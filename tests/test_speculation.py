"""Q-SLOW analog — straggler detection via speculative execution.

The reference ships deliberately-slow exec programs
(``tests/testdata/exec/wc_map_slow.sh:12-15``,
``wc_reduce_slow.sh:14-17``) to prove the framework finishes a job
despite a slow worker. Spark's mechanism is speculation: the scheduler
thread compares running-task times against the completed-task median
and marks outliers speculatable, then relaunches them elsewhere.

What one machine can and cannot prove:

* CAN: the speculation thread starts, the injected straggler is
  DETECTED and marked speculatable (``TaskSetManager`` driver log), and
  the job still completes with the exact result.
* CANNOT: the relaunch itself — ``dequeueSpeculativeTask`` refuses to
  place a speculative copy on a host that already runs an attempt, and
  ``local-cluster`` executors all share one host. The re-execution
  machinery is the same code path the dead-worker test
  (``tests/test_fault_tolerance.py``) already proves end-to-end.

Runs in a subprocess: ``spark.speculation`` is fixed at session start,
and ``local-cluster`` (real executor JVMs — plain ``local[N]`` never
starts the speculation thread) must not leak into the shared session.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

_LOG4J = textwrap.dedent(
    """
    rootLogger.level = info
    rootLogger.appenderRef.f.ref = F
    appender.f.type = File
    appender.f.name = F
    appender.f.fileName = {log_file}
    appender.f.layout.type = PatternLayout
    appender.f.layout.pattern = %p %c{{1}}: %m%n
    """
)

_SCRIPT = textwrap.dedent(
    """
    import sys
    import time

    from pyspark import TaskContext
    from pyspark.sql import SparkSession

    log4j_conf = sys.argv[1]
    SLEEP_S = 10.0
    spark = (
        SparkSession.builder.master("local-cluster[2,2,1024]")
        .appName("mgs-qslow")
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dlog4j2.configurationFile=file://{log4j_conf}",
        )
        .config("spark.speculation", "true")
        # aggressive thresholds so the probe is fast: check every 100 ms,
        # speculate once a task runs 1.5x the median of the 25% fastest;
        # the efficiency gate (3.4+) would mask tiny-input stragglers
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.multiplier", "1.5")
        .config("spark.speculation.quantile", "0.25")
        .config("spark.speculation.efficiency.enabled", "false")
        .getOrCreate()
    )
    sc = spark.sparkContext

    def straggler_sum(it):
        tc = TaskContext.get()
        if tc.partitionId() == 0 and tc.attemptNumber() == 0:
            print("straggler attempt started", file=sys.stderr)
            for _ in range(int(SLEEP_S / 0.25)):
                time.sleep(0.25)
        yield sum(it)

    total = sc.parallelize(range(1000), 8).mapPartitions(straggler_sum).sum()
    assert total == 499500, total
    spark.stop()
    print("QSLOW-OK")
    """
)


def test_straggler_is_detected_and_job_completes(tmp_path):
    log_file = tmp_path / "driver.log"
    conf_file = tmp_path / "log4j2.properties"
    conf_file.write_text(_LOG4J.format(log_file=log_file), encoding="ascii")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(conf_file)],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "QSLOW-OK" in res.stdout, res.stdout[-2000:]
    log = log_file.read_text(encoding="utf-8", errors="replace")
    # the speculation machinery must actually have engaged
    assert "Starting speculative execution thread" in log
    # ...and the injected straggler must have been detected
    assert "as speculatable" in log, log[-3000:]
