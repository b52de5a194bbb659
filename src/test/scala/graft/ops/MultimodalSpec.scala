package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("m05: same-size blocking pairs docs; exact payload clones flag is_dup") {
    val sparkS = spark
    import sparkS.implicits._
    graft.functions.VectorExpressions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("m05spec").toFile
    try {
      Seq(
        (1L, "hello world"), // 11 bytes
        (2L, "hello world"), // exact clone -> cos 1.0
        (3L, "jello wurld"), // same LENGTH, different content
        (4L, "tiny")) // different length: never blocked
        .toDF("doc_id", "text")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .withColumn("source", org.apache.spark.sql.functions.lit("src1"))
        .withColumn("n_chars",
          org.apache.spark.sql.functions.length(col("text")).cast("long"))
        .write.mode("overwrite")
        .parquet(s"${dir.getAbsolutePath}/documents.parquet")
      val out = graft.SparkEntry
        .queries("m05_feature_neardup")(spark, dir.getAbsolutePath)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(3), r.getInt(4)))).toMap
      // all three 11-byte docs pair up; only the true clone flags
      assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), out)
      assert(out((1L, 2L)) == ((1.0, 1)), out)
      assert(out((1L, 3L))._2 == 0 && out((2L, 3L))._2 == 0, out)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("m06: per-source card counts volume, formats, exact dups and near-dups") {
    val sparkS = spark
    import sparkS.implicits._
    graft.functions.VectorExpressions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("m06spec").toFile
    try {
      // srcA: an exact clone pair (dup_docs=1, both near-dup) + one
      // odd-length doc; srcB: two distinct same-length payloads (a
      // blocked pair that does NOT flag) + a null payload (skipped).
      Seq(
        (1L, "hello world", "srcA"),
        (2L, "hello world", "srcA"), // exact clone of 1
        (3L, "tiny", "srcA"),
        (4L, "jello wurld", "srcB"), // same length as 1/2, diff bytes
        (5L, "mello warld", "srcB"),
        (6L, null.asInstanceOf[String], "srcB"))
        .toDF("doc_id", "text", "source")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .withColumn("n_chars",
          org.apache.spark.sql.functions.length(col("text")).cast("long"))
        .write.mode("overwrite")
        .parquet(s"${dir.getAbsolutePath}/documents.parquet")
      val out = graft.SparkEntry
        .queries("m06_multimodal_data_card")(spark, dir.getAbsolutePath)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5)))).toMap
      // (n_payloads, total_bytes, n_formats, dup_docs, near_dup_docs)
      val a = out("srcA")
      assert(a._1 == 3 && a._2 == 11 + 11 + 4, a)
      // clones share one format; doc 3 adds another unless its hash
      // dims collide -> 1..2
      assert(a._3 >= 1 && a._3 <= 2, a)
      assert(a._4 == 1, a) // one exact dup (the clone)
      assert(a._5 == 2, a) // both clone members are near-dup docs
      val b = out("srcB")
      assert(b._1 == 2 && b._2 == 22, b) // null payload skipped
      assert(b._4 == 0, b)
      // 4/5 pair with 1/2 by length but hash features ~never reach
      // 0.999 for different payloads; 4-vs-5 likewise
      assert(b._5 == 0, b)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("m07: perceptual blocking needs no byte-length match; only true clones emit") {
    val sparkS = spark
    import sparkS.implicits._
    graft.functions.VectorExpressions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("m07spec").toFile
    try {
      Seq(
        (1L, "hello world"),
        (2L, "hello world"), // clone: same dims, same sign code, cos 1.0
        (3L, "jello wurld"), // same byte LENGTH, different content
        (4L, "tiny"))
        .toDF("doc_id", "text")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .withColumn("source", org.apache.spark.sql.functions.lit("src1"))
        .withColumn("n_chars",
          org.apache.spark.sql.functions.length(col("text")).cast("long"))
        .write.mode("overwrite")
        .parquet(s"${dir.getAbsolutePath}/documents.parquet")
      val rows = graft.SparkEntry
        .queries("m07_perceptual_neardup")(spark, dir.getAbsolutePath)
        .collect()
        .map(r => ((r.getLong(3), r.getLong(4)),
          (r.getInt(5), r.getDouble(6), r.getInt(7))))
      // the clone pair tops its format block: cos 1.0, matching sign
      // codes, flagged dup — blocked WITHOUT any byte-length key
      val clone = rows.toMap.get((1L, 2L))
      assert(clone.contains((1, 1.0, 1)), rows.toSeq)
      // no other best-pair reaches the dup verdict (same-length noise
      // included): only byte-exact content flags
      assert(rows.count(_._2._3 == 1) == 1, rows.toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("m07 multi-probe: Hamming-1 sign pairs collide exactly once; Hamming-2 never") {
    val sparkS = spark
    import sparkS.implicits._
    graft.functions.VectorExpressions.register(spark)
    // Hand-built decoded frame, all in ONE format block (64×64):
    //   10 ↔ 11: identical signs (Hamming 0)
    //   10 ↔ 12: one near-boundary sign flipped (Hamming 1) — the
    //            pair the flip-1 probe must recover
    //   10 ↔ 13: two signs flipped (Hamming 2) — out of reach by
    //            design, must NOT appear
    val base = Array.fill(8)(0.5)
    val flip1 = base.updated(7, -0.5)
    val flip2 = base.updated(7, -0.5).updated(6, -0.5)
    val dec = Seq(
      (10L, 64, 64, base.toSeq),
      (11L, 64, 64, base.map(_ * 0.9).toSeq), // same signs, not a clone
      (12L, 64, 64, flip1.toSeq),
      (13L, 64, 64, flip2.toSeq))
      .toDF("doc_id", "width", "height", "v")
    val out = Multimodal.perceptualBestPairs(dec).collect()
      .map(r => (r.getInt(2), (r.getLong(3), r.getLong(4)), r.getInt(5)))
    // bucket sig=255 (all signs positive): best pair is the
    // same-direction pair (10,11), sig_match 1 — the identity probe
    assert(out.exists(p => p._1 == 255 && p._2 == ((10L, 11L)) &&
      p._3 == 1), out.toSeq)
    // Hamming-1 recovered: bucket sig=127 (12's code) pairs 12 with a
    // flip-1 prober (tie on cosine -> doc_a asc -> 10), sig_match 0
    assert(out.exists(p => p._1 == 127 && p._2 == ((10L, 12L)) &&
      p._3 == 0), out.toSeq)
    // Hamming-2 invisible by design: 13 never pairs with 10/11 (two
    // bits apart) — only with 12 (one bit apart, bucket sig=63)
    assert(!out.exists(p => p._2._2 == 13L && p._2._1 <= 11L), out.toSeq)
    assert(out.exists(p => p._1 == 63 && p._2 == ((12L, 13L))), out.toSeq)
    // exactly-once collision: a Hamming-0 pair must not double-emit
    // through a flip probe — every (doc_a, doc_b) appears in one
    // bucket only (here every best-pair row is a distinct pair)
    assert(out.map(_._2).distinct.length == out.length, out.toSeq)
  }

  test("m08 keepers: largest payload wins its family; sub-gate and " +
      "zero-feature blobs are kept singletons") {
    val sparkS = spark
    import sparkS.implicits._
    graft.functions.VectorExpressions.register(spark)
    val base = Array.fill(8)(0.5)
    val flip1 = base.updated(7, -0.5) // Hamming 1 but cos 0.75 < 0.999
    val dec = Seq(
      // dup pair: parallel vectors (cos 1.0) — the LARGER payload
      // must be kept even though its doc_id is higher
      (10L, 64, 64, 100L, base.toSeq),
      (11L, 64, 64, 200L, base.map(_ * 0.9).toSeq),
      // Hamming-1 neighbor below the cosine gate: candidate pair
      // exists, edge must NOT — singleton, keeps itself
      (12L, 64, 64, 50L, flip1.toSeq),
      // zero features: unscorable, singleton, keeps itself
      (13L, 64, 64, 10L, Seq.fill(8)(0.0)),
      // a clone trio in another block: one family, max payload wins
      (20L, 32, 32, 300L, base.toSeq),
      (21L, 32, 32, 500L, base.toSeq),
      (22L, 32, 32, 400L, base.map(_ * 1.1).toSeq))
      .toDF("doc_id", "width", "height", "n_bytes", "v")
    val out = Multimodal.perceptualKeepers(dec).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(3)))).toMap
    assert(out == Map(
      10L -> ((10L, 0)), 11L -> ((10L, 1)), // family 10, 200B copy kept
      12L -> ((12L, 1)), 13L -> ((13L, 1)), // singletons keep themselves
      20L -> ((20L, 0)), 21L -> ((20L, 1)), 22L -> ((20L, 0))), out)
  }

  test("m09 decontamination: Hamming-0/1 eval matches flag, Hamming-2 and " +
      "low-cosine survive, eval docs ungraded") {
    val sparkS = spark
    import sparkS.implicits._
    graft.functions.VectorExpressions.register(spark)
    // ε-feature trick: flipping feature 0 between +0.001 and -0.001
    // flips one sign bit while keeping cosine ≈ 1 (> 0.999) — the
    // re-encode-near-boundary case the flip-1 probe must recover.
    val ev = 0.001 +: Seq.fill(7)(1.0)
    val flip1 = -0.001 +: Seq.fill(7)(1.0)
    val flip2 = Seq(-0.001, -0.001) ++ Seq.fill(6)(1.0)
    val ortho = 5.0 +: Seq.fill(7)(0.001) // same sig 255, low cosine
    val dec = Seq(
      // eval slice (doc_id % 23 == 0): two identical eval blobs
      (46L, 64, 64, ev),
      (92L, 64, 64, ev),
      // train: exact feature copy — Hamming 0, hits BOTH evals
      (1L, 64, 64, ev),
      // train: one near-boundary sign flipped — Hamming 1, recovered
      // via the flip-1 probe, hits both evals
      (2L, 64, 64, flip1),
      // train: two signs flipped — invisible by design
      (3L, 64, 64, flip2),
      // train: same sig block, but cosine far below the dup gate
      (4L, 64, 64, ortho),
      // train: same features, different dims — never a candidate
      (5L, 32, 32, ev))
      .toDF("doc_id", "width", "height", "v")
    val out = Multimodal.perceptualDecontaminate(dec).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out == Map(
      1L -> ((2L, 0)), 2L -> ((2L, 0)), // flagged, both evals attributed
      3L -> ((0L, 1)), 4L -> ((0L, 1)), 5L -> ((0L, 1))), out)
    // eval blobs themselves are never graded
    assert(!out.contains(46L) && !out.contains(92L), out)
  }

  test("m10 admission: verdicts fire per gate with stated precedence") {
    val sparkS = spark
    import sparkS.implicits._
    graft.functions.VectorExpressions.register(spark)
    val pos = Seq.fill(8)(0.5) // sig 255
    val neg = Seq.fill(8)(-0.5) // sig 0 — Hamming 8 from pos
    val alt = Seq(0.5, -0.5, 0.5, -0.5, 0.5, -0.5, 0.5, -0.5)
    val tla = Seq(-0.5, 0.5, -0.5, 0.5, -0.5, 0.5, -0.5, 0.5)
    val dec = Seq(
      // eval blob (23 % 23 == 0), deliberately TINY (16-wide) so its
      // training near-dups can fail every gate at once
      (23L, 16, 64, 100L, pos),
      // contaminated + duplicate (loses its family to 25) + tiny —
      // precedence must report contamination
      (24L, 16, 64, 100L, pos),
      // contaminated but the family KEEPER — still contaminated
      (25L, 16, 64, 200L, pos),
      // clean dup pair, full-size: 27 keeps (larger payload),
      // 26 reports duplicate
      (26L, 64, 64, 50L, neg),
      (27L, 64, 64, 60L, neg),
      // clean, unique, tiny -> too_small
      (28L, 16, 64, 10L, alt),
      // clean, unique, full-size -> admitted
      (29L, 64, 64, 10L, tla))
      .toDF("doc_id", "width", "height", "n_bytes", "v")
    val out = Multimodal.multimodalAdmission(dec).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))))
      .toMap
    assert(!out.contains(23L), s"eval blob graded: $out")
    assert(out(24L) === ((0, 0, 0, "contaminated")), out(24L).toString)
    assert(out(25L) === ((0, 1, 0, "contaminated")), out(25L).toString)
    assert(out(26L) === ((1, 0, 1, "duplicate")), out(26L).toString)
    assert(out(27L) === ((1, 1, 1, "admitted")), out(27L).toString)
    assert(out(28L) === ((1, 1, 0, "too_small")), out(28L).toString)
    assert(out(29L) === ((1, 1, 1, "admitted")), out(29L).toString)
  }

  test("m11: clone pairs land in 'both'; verdicts stay flag-consistent") {
    import spark.implicits._
    // Engineered corpus: docs 1/2 are byte-exact clones (both tiers
    // must pair them -> 'both'); 3 and 4 are unrelated prose. The
    // testdata has no exact clones, so the 'both' quadrant is only
    // reachable on an engineered corpus.
    val clone = "the quick brown fox jumps over the lazy dog while " +
      "rain falls on green hills and birds sing near the river"
    val docs = Seq(
      (1L, clone), (2L, clone),
      (3L, "completely different words about spark joins and windows"),
      (4L, "unrelated prose concerning parquet files and columnar io"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'srcX' AS source",
        "length(text) AS n_chars")
    val dir = java.nio.file.Files.createTempDirectory("m11-spec")
      .toFile.getAbsolutePath
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry
      .queries("m11_modality_disagreement")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    rows.foreach { case (a, b, t, v, verdict) =>
      assert(a < b, s"unordered pair ($a, $b)")
      val expect = (t, v) match {
        case (1, 1) => "both"
        case (1, 0) => "text_only"
        case (0, 1) => "visual_only"
        case other => fail(s"pair ($a, $b) flags $other")
      }
      assert(verdict === expect, s"pair ($a, $b)")
      // Stub-decoder invariant: the payload IS the text bytes, so a
      // perceptual dup is a byte-exact clone, which SimHash also
      // pairs — visual_only cannot occur until a real decoder makes
      // payloads diverge from text.
      assert(verdict !== "visual_only", s"pair ($a, $b)")
    }
    assert(rows.exists(r => r._1 == 1L && r._2 == 2L && r._5 == "both"),
      s"the clone pair must be flagged by both tiers: ${rows.toSeq}")
  }

  test("m12 scene detect: single-frame guard; boundaries match a JVM recompute") {
    val sparkS = spark
    import sparkS.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // Independent JVM restatement of the frame/feature arithmetic.
    def feats(text: String): Seq[Long] =
      (0 to (text.length - 1) / 192).map { i =>
        val frame = text.slice(i * 192, i * 192 + 64)
        java.lang.Long.parseLong(md5hex(frame).take(7), 16)
      }
    val a = "x" * 100 // one frame: the greatest() guard path
    val b = (0 until 1000) // six frames, varied content
      .map(i => ('a' + (i * 7) % 26).toChar).mkString
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = Multimodal.sceneDetect(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) === ((1, 1, md5hex(""))), out.toString)
    val fb = feats(b)
    val bounds = (1 until fb.length)
      .filter(i => math.abs(fb(i) - fb(i - 1)) > 134217728L)
    assert(out(2L) === ((fb.length, bounds.length + 1,
      md5hex(bounds.mkString(",")))), out.toString)
    // A detector that never fires (or always fires) proves nothing:
    // the varied-content doc must contain at least one cut and at
    // least one non-cut.
    assert(bounds.nonEmpty && bounds.length < fb.length - 1)
  }

  test("m13 silence runs: fold matches an independent JVM run-length scan") {
    val sparkS = spark
    import sparkS.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def feats(text: String): Seq[Long] =
      (0 to (text.length - 1) / 192).map { i =>
        java.lang.Long.parseLong(
          md5hex(text.slice(i * 192, i * 192 + 64)).take(7), 16)
      }
    def scan(flags: Seq[Boolean]): (Int, Int, Int) = { // silent, runs, best
      var cur = 0; var best = 0; var runs = 0
      flags.foreach { s =>
        cur = if (s) cur + 1 else 0
        best = math.max(best, cur)
        if (s && cur == 1) runs += 1
      }
      (flags.count(identity), runs, best)
    }
    val varied = (0 until 1000).map(i => ('a' + (i * 7) % 26).toChar).mkString
    // "a"*576 yields three identical leading frames whose feature is
    // silent (md5("a"*64) prefix < 2^26) — a genuine multi-frame run.
    val withRun = ("a" * 576) + varied
    val docs = Seq((1L, varied), (2L, withRun)).toDF("doc_id", "text")
    val out = Multimodal.silenceRuns(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    Seq(1L -> varied, 2L -> withRun).foreach { case (id, text) =>
      val fs = feats(text)
      val (silent, runs, best) = scan(fs.map(_ < 67108864L))
      assert(out(id) === ((fs.length, silent, runs, best)),
        s"doc $id: ${out(id)} vs JVM (${fs.length}, $silent, $runs, $best)")
    }
    // The engineered doc must actually exercise run accumulation:
    // a ≥3-frame run and more than one distinct run.
    assert(out(2L)._4 >= 3 && out(2L)._3 >= 2, out.toString)
  }

  test("m14 trims exactly the frames m13 calls silent, and a fully-" +
      "silent track digests to md5('')") {
    val dir = "/root/testdata/sf0.001"
    val runs = graft.SparkEntry.queries("m13_silence_runs")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    val trim = graft.SparkEntry.queries("m14_silence_trim")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    assert(trim.keySet === runs.keySet)
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    trim.foreach { case (id, (nf, nk, digest)) =>
      val (mf, ms) = runs(id)
      assert(nf == mf, s"doc $id frame count: $nf vs m13's $mf")
      assert(nk == mf - ms, s"doc $id kept: $nk vs ${mf - ms}")
      if (nk == 0) assert(digest == emptyMd5, s"doc $id empty digest")
      else assert(digest != emptyMd5, s"doc $id non-empty digest")
    }
    // Non-vacuous: the corpus contains silent frames AND at least one
    // fully-silent (all-trimmed) track.
    assert(trim.values.exists(v => v._2 < v._1), "nothing trimmed")
    assert(trim.values.exists(v => v._2 == 0 && v._1 > 0),
      "no fully-silent track at this SF")
  }

  test("m15 WAV codec: the parser round-trips the builder through " +
      "both physical layouts, and malformed containers fail with " +
      "typed reasons, never garbage rows") {
    // 3 LE samples + one odd trailing byte (dropped by contract):
    // 0x0001 = 1, 0x8010 = -32752, 0x7fff = 32767.
    val pcm = Array[Byte](1, 0, 0x10, 0x80.toByte, 0xff.toByte, 0x7f, 9)
    val wav = WavCodec.build(pcm)
    val w = WavCodec.parse(wav).toOption.get
    assert(w.nChannels == 1 && w.sampleRate == 8000 &&
      w.bitsPerSample == 16)
    assert(w.samples.toSeq == Seq[Short](1, -32752, 32767))
    // Integer features off the DECODED samples: signs + - + give two
    // sign changes.
    assert(WavCodec.features(w) ==
      ((3L, 32767L, 1L + 32752L + 32767L, 2L)))
    // The LIST-chunk layout holds the same logical audio through a
    // different chunk walk (fixed-offset parsing would misread it —
    // and its odd-sized payload exercises the alignment pad).
    val w2 = WavCodec.parse(WavCodec.build(pcm, withJunk = true))
      .toOption.get
    assert(w2.samples.toSeq == w.samples.toSeq &&
      w2.sampleRate == w.sampleRate)
    // Typed failures.
    assert(WavCodec.parse(Array[Byte](1, 2, 3)) ==
      Left("truncated header"))
    assert(WavCodec.parse(
      "JUNK".getBytes("US-ASCII") ++ wav.drop(4)) ==
      Left("not a RIFF container"))
    assert(WavCodec.parse(wav.dropRight(1)) ==
      Left("truncated container"))
    val notWave = wav.clone()
    System.arraycopy("AIFF".getBytes("US-ASCII"), 0, notWave, 8, 4)
    assert(WavCodec.parse(notWave) == Left("not a WAVE form"))
    val badCodec = wav.clone()
    badCodec(20) = 3 // fmt audioFormat low byte: 12 (RIFF hdr) + 8
    assert(WavCodec.parse(badCodec) ==
      Left("unsupported codec 3 (want PCM)"))
    val bad8bit = wav.clone()
    bad8bit(34) = 8 // bitsPerSample low byte: 12 + 8 + 14
    assert(WavCodec.parse(bad8bit) ==
      Left("unsupported sample width 8 (want 16)"))
    // fmt-only container: header + fmt chunk, declared size patched.
    val fmtOnly = java.util.Arrays.copyOf(wav, 12 + 24)
    java.nio.ByteBuffer.wrap(fmtOnly)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4, 28)
    assert(WavCodec.parse(fmtOnly) == Left("missing data chunk"))
    // Empty audio is VALID (a zero-length data chunk), not an error.
    val empty = WavCodec.parse(WavCodec.build(Array.empty[Byte]))
      .toOption.get
    assert(empty.samples.isEmpty &&
      WavCodec.features(empty) == ((0L, 0L, 0L, 0L)))
  }

  test("m16 BMP codec: the parser round-trips the builder through " +
      "bottom-up, top-down and gapped layouts, honors the row " +
      "stride, and malformed containers fail with typed reasons") {
    // 2 full rows at width 2 (12 bytes) + 3 trailing bytes (dropped):
    // logical grid row 0 = bytes 0..5, row 1 = bytes 6..11.
    val raw = (1 to 15).map(_.toByte).toArray
    val canonical = BmpCodec.build(raw, width = 2)
    // width 2 ⇒ 6-byte rows padded to stride 8; bottom-up storage
    // puts logical row 1 FIRST physically — total 14+40+2*8.
    assert(canonical.length == 54 + 16)
    val img = BmpCodec.parse(canonical).toOption.get
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == raw.take(12).toSeq,
      "bottom-up storage not normalized back to logical order")
    // Top-down and gapped layouts hold the SAME logical image through
    // different physical layouts (a parser that ignored the height
    // sign or assumed bfOffBits = 54 would misread exactly these).
    for (v <- Seq(BmpCodec.build(raw, width = 2, topDown = true),
        BmpCodec.build(raw, width = 2, gap = 16),
        BmpCodec.build(raw, width = 2, topDown = true, gap = 16))) {
      val p = BmpCodec.parse(v).toOption.get
      assert(p.pixels.toSeq == img.pixels.toSeq &&
        p.width == 2 && p.height == 2, "layout variant diverged")
    }
    // Integer features: per-channel sums over bytes 1..12 by i%3 and
    // the position-weighted checksum — computed here BY HAND so a
    // shared features/oracle bug cannot self-certify.
    //   sum_b = 1+4+7+10, sum_g = 2+5+8+11, sum_r = 3+6+9+12
    //   wsum  = Σ (y+1)(x+1)w(c)v over the logical grid
    val byHand = (0 until 12).map { i =>
      val (p, c, v) = (i / 3, i % 3, (i + 1).toLong)
      (p / 2 + 1).toLong * (p % 2 + 1).toLong * (1L << c) * v
    }.sum
    assert(BmpCodec.features(img) == ((22L, 26L, 30L, byHand)))
    // Short input zero-pads to one full row — zeros are feature-inert.
    val short = BmpCodec.parse(BmpCodec.build(Array[Byte](5), width = 2))
      .toOption.get
    assert(short.height == 1 && short.pixels.length == 6)
    assert(BmpCodec.features(short) == ((5L, 0L, 0L, 5L)))
    // Typed failures.
    assert(BmpCodec.parse(Array[Byte](1, 2, 3)) ==
      Left("truncated header"))
    assert(BmpCodec.parse("XX".getBytes("US-ASCII") ++
      canonical.drop(2)) == Left("not a BM container"))
    assert(BmpCodec.parse(canonical.dropRight(1)) ==
      Left("truncated container"))
    val bad8 = canonical.clone(); bad8(28) = 8
    assert(BmpCodec.parse(bad8) == Left("unsupported depth 8 (want 24)"))
    val rle = canonical.clone(); rle(30) = 1
    assert(BmpCodec.parse(rle) == Left("unsupported compression 1"))
    val zeroW = canonical.clone(); zeroW(18) = 0
    assert(BmpCodec.parse(zeroW) == Left("bad dimensions 0x2"))
    // Declared pixel array overrunning the file: shrink bfSize is
    // caught first, so instead declare a LARGER height than the file
    // holds while keeping bfSize honest about the (truncated) bytes.
    val tall = BmpCodec.build(raw, width = 2)
    java.nio.ByteBuffer.wrap(tall)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, 5)
    assert(BmpCodec.parse(tall) == Left("truncated pixel array"))
  }

  test("m17 aHash: hand-computed bits on a known quadrant image, and " +
      "the hash is invariant across every physical container layout") {
    // 2x2 logical image from bytes 1..12: lumas (B+2G+4R) per pixel
    // are 17, 38 / 59, 80. At width=height=2 the 8x8 sample grid
    // collapses onto quadrants: 16 samples each. mean = 194/4 = 48;
    // only the bottom row (59, 80 — sample rows gy >= 4, i.e. bits
    // 32..63) exceeds it, so h_lo = 0 and h_hi = 2^32 - 1.
    val raw = (1 to 12).map(_.toByte).toArray
    val img = BmpCodec.parse(BmpCodec.build(raw, width = 2)).toOption.get
    assert(BmpCodec.ahash(img) == ((48L, 0L, 4294967295L)))
    // The PERCEPTUAL signature must see the logical image, not the
    // container: bottom-up, top-down and gapped layouts of the same
    // pixels hash identically — this is exactly what the byte-hash
    // stand-in (m07's fakeDecodeBatch tier) could never certify.
    for (v <- Seq(BmpCodec.build(raw, width = 2, topDown = true),
        BmpCodec.build(raw, width = 2, gap = 16),
        BmpCodec.build(raw, width = 2, topDown = true, gap = 16)))
      assert(BmpCodec.ahash(BmpCodec.parse(v).toOption.get) ==
        ((48L, 0L, 4294967295L)), "layout changed the perceptual hash")
    // A genuinely different image hashes differently (non-vacuity):
    // swap the bright and dark rows.
    val flipped = BmpCodec.parse(BmpCodec.build(
      raw.slice(6, 12) ++ raw.slice(0, 6), width = 2)).toOption.get
    assert(BmpCodec.ahash(flipped) == ((48L, 4294967295L, 0L)))
  }
}
