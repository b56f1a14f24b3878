package graft.stub

/** Standalone launcher for the in-process Alpaca stub server, so
  * EXTERNAL clients (e.g. `scripts/ref_bench.py`, which benchmarks the
  * reference PySpark connector against the identical fixture data) can
  * reach the same HTTP surface the Scala tests use. Prints the
  * endpoint and blocks until killed; all server threads are daemons,
  * the main thread is the only thing keeping the JVM up. */
object StubMain {
  def main(args: Array[String]): Unit = {
    println(s"STUB_ENDPOINT=${AlpacaStubServer.endpoint}")
    Console.flush()
    Thread.currentThread.join()
  }
}
