"""F13 fault-tolerance analog of reference ``tests/test_manager_05.py``
(dead-worker task reassignment): kill a task attempt mid-job and assert
Spark re-executes it and the job's result is still exactly correct.

Runs in a subprocess because local mode only retries tasks when the
master is ``local[N, maxFailures]`` — the shared test session is plain
``local[N]`` (fail-fast, the right default everywhere else).
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

_SCRIPT = textwrap.dedent(
    """
    import sys
    from pyspark import TaskContext

    from mapreduce_google_spark.io import load_table
    from mapreduce_google_spark.session import get_spark

    sf_dir = sys.argv[1]
    # local[4, 2]: 4 threads, 2 task attempts — the retry path exists
    spark = get_spark(app_name="mgs-f13", master="local[4, 2]")
    sc = spark.sparkContext

    # --- RDD surface: every first attempt of partition 0 dies -------------
    # (injection is proven by the traceback on stderr, which the pytest
    # wrapper asserts on — accumulator updates from FAILED attempts are
    # discarded by design, so they can't witness the death)

    def flaky_sum(it):
        tc = TaskContext.get()
        if tc.partitionId() == 0 and tc.attemptNumber() == 0:
            raise RuntimeError("injected worker death (attempt 0)")
        yield sum(it)

    total = sc.parallelize(range(1000), 8).mapPartitions(flaky_sum).sum()
    assert total == 499500, total

    # --- DataFrame surface: flaky stage inside a real pipeline ------------
    docs = load_table(spark, sf_dir, "documents")

    def flaky_identity(batches):
        tc = TaskContext.get()
        if tc.partitionId() == 0 and tc.attemptNumber() == 0:
            raise RuntimeError("injected worker death (attempt 0)")
        yield from batches

    survived = (
        docs.repartition(4)
        .mapInPandas(flaky_identity, docs.schema)
        .count()
    )
    expected = docs.count()
    assert survived == expected, (survived, expected)

    spark.stop()
    print("RECOVERED-OK")
    """
)


def test_task_failure_is_retried_and_result_correct(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT, sf_dir],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "RECOVERED-OK" in res.stdout
    # the injected failure must actually have surfaced (and been survived)
    assert "injected worker death" in res.stderr
