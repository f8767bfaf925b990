package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Single-pass PCM16LE kernels shared by the interpreted and generated
  * paths of [[PcmStatsExpr]] / [[SynthPcm16Expr]] — the byte loops behind
  * [[graft.operators.Multimodal.audioFeatures]] / `synthPcm16`. A
  * higher-order-function formulation of the same math evaluates its
  * lambdas interpretively PER SAMPLE (Spark's array HOFs do not
  * participate in whole-stage codegen) and measured ~20 s for 5 k docs ×
  * 480 samples at sf0.1; one fused kernel call per row inside the
  * projection's codegen span is ~50× cheaper and is exactly the
  * "custom native Expression beats everything interpreted" rule.
  */
object PcmKernel {

  /** (n_samples, Σs², peak, zero_crossings, n_full_frames,
    * active_frames) in one pass. Sign rule: zero counts positive; only
    * FULL frames of `frame` samples are scored; a frame is active iff
    * its energy Σs² strictly exceeds `threshold` (exact long compare).
    * Odd trailing bytes stay out of the sample stream. Bit-identical to
    * the HOF formulation this replaces (q282/q283 oracles unchanged). */
  def stats(bytes: Array[Byte], frame: Int, threshold: Long): Array[Long] = {
    val n = bytes.length / 2
    var ss = 0L; var peak = 0L; var zc = 0L
    var frameAcc = 0L; var nFrames = 0L; var active = 0L
    var prev = 0; var i = 0
    while (i < n) {
      val raw = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
      val s = if (raw < 32768) raw else raw - 65536
      ss += s.toLong * s
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      if (i > 0 && ((prev >= 0 && s < 0) || (prev < 0 && s >= 0))) zc += 1
      prev = s
      frameAcc += s.toLong * s
      if ((i + 1) % frame == 0) {
        if (frameAcc > threshold) active += 1
        nFrames += 1
        frameAcc = 0L
      }
      i += 1
    }
    Array(n.toLong, ss, peak, zc, nFrames, active)
  }

  /** Deterministic integer-ratio LINEAR resample of an s16le stream —
    * the 8 kHz-telephony → 16 kHz-model-rate step of a speech pipeline.
    * Output sample j sits at rational input position j·from/to:
    * `idx = floorDiv(j·from, to)`, `frac = j·from mod to`,
    * `out[j] = s[idx] + floorDiv((s[idx+1] − s[idx])·frac, to)` —
    * pure integer math (floorDiv, exact in any engine), linear
    * interpolation floored onto the PCM lattice, so the SQL oracle
    * regenerates every output sample from the closed-form input signal.
    * `n_out = floorDiv((n_in−1)·to, from) + 1` — the output covers
    * exactly the input span (last output lands ON the last input when
    * the ratio divides evenly). Odd trailing bytes stay out, mirroring
    * [[stats]]. Empty/one-sample inputs pass through unchanged. */
  def resample(bytes: Array[Byte], fromRate: Int, toRate: Int): Array[Byte] = {
    val nIn = bytes.length / 2
    if (nIn <= 1 || fromRate == toRate) {
      val out = new Array[Byte](nIn * 2)
      System.arraycopy(bytes, 0, out, 0, nIn * 2)
      return out
    }
    def sample(k: Int): Int = {
      val raw = (bytes(2 * k) & 0xff) | ((bytes(2 * k + 1) & 0xff) << 8)
      if (raw < 32768) raw else raw - 65536
    }
    val nOut = (Math.floorDiv((nIn - 1).toLong * toRate, fromRate) + 1L).toInt
    val out = new Array[Byte](nOut * 2)
    var j = 0
    while (j < nOut) {
      val num = j.toLong * fromRate
      val idx = Math.floorDiv(num, toRate).toInt
      val frac = Math.floorMod(num, toRate.toLong)
      val s0 = sample(idx)
      val v =
        if (frac == 0L) s0
        else s0 + Math.floorDiv((sample(idx + 1) - s0).toLong * frac, toRate.toLong).toInt
      val u = if (v < 0) v + 65536 else v
      out(2 * j) = (u & 0xff).toByte
      out(2 * j + 1) = ((u >> 8) & 0xff).toByte
      j += 1
    }
    out
  }

  /** Energy-VAD SPEECH SEGMENTS of an s16le stream — the utterance
    * extraction step between decode/resample and a usable speech-data
    * pipeline (split long telephony audio into trainable utterances,
    * drop silence). One pass, flattened `(start_frame, span_frames)`
    * pairs:
    *
    *  1. frame energies: Σs² per FULL frame of `frame` samples (the
    *     [[stats]] rule — odd trailing bytes and a partial tail frame
    *     stay out);
    *  2. a frame is ACTIVE iff its energy STRICTLY exceeds `threshold`
    *     (exact long compare, the [[stats]] activity rule);
    *  3. active frames separated by ≤ `maxGap` inactive frames merge
    *     into one segment (hangover — a clap of silence inside an
    *     utterance must not split it);
    *  4. merged segments SPANNING fewer than `minFrames` frames drop
    *     (an isolated energy blip is not speech).
    *
    * All-integer and positional, so a SQL oracle replays it with one
    * gaps-and-islands pass over the closed-form frame energies. */
  def vadSegments(
      bytes: Array[Byte], frame: Int, threshold: Long,
      maxGap: Int, minFrames: Int): Array[Long] = {
    val n = bytes.length / 2
    val nFrames = n / frame
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var segStart = -1; var lastActive = -1
    def close(): Unit = {
      if (segStart >= 0 && lastActive - segStart + 1 >= minFrames) {
        out += segStart.toLong; out += (lastActive - segStart + 1).toLong
      }
    }
    var f = 0
    while (f < nFrames) {
      var e = 0L
      var i = f * frame
      val end = i + frame
      while (i < end) {
        val raw = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
        val s = (if (raw < 32768) raw else raw - 65536).toLong
        e += s * s
        i += 1
      }
      if (e > threshold) {
        if (segStart < 0) { segStart = f; lastActive = f }
        else if (f - lastActive - 1 <= maxGap) lastActive = f
        else { close(); segStart = f; lastActive = f }
      }
      f += 1
    }
    close()
    out.toArray
  }

  /** PEAK-NORMALIZE an s16le stream — the loudness-alignment step of a
    * speech-data pipeline (mixed-gain telephony captures must match the
    * model's expected level before features are comparable): one pass
    * finds `peak = max|s|`, a second rescales every sample to
    * `out_i = floorDiv(s_i · targetPeak, peak)` — exact integer math
    * (the [[resample]] floor-div discipline; the peak sample maps to
    * ±targetPeak exactly, everything else scales proportionally, floored
    * onto the PCM lattice). All-zero/empty streams pass through
    * unchanged (no gain can be defined); odd trailing bytes stay out. */
  def gainNormalize(bytes: Array[Byte], targetPeak: Int): Array[Byte] = {
    val n = bytes.length / 2
    def sample(k: Int): Int = {
      val raw = (bytes(2 * k) & 0xff) | ((bytes(2 * k + 1) & 0xff) << 8)
      if (raw < 32768) raw else raw - 65536
    }
    var peak = 0L
    var i = 0
    while (i < n) {
      val a = math.abs(sample(i).toLong)
      if (a > peak) peak = a
      i += 1
    }
    val out = new Array[Byte](n * 2)
    if (peak == 0L) {
      System.arraycopy(bytes, 0, out, 0, n * 2)
      return out
    }
    i = 0
    while (i < n) {
      val v = Math.floorDiv(sample(i).toLong * targetPeak, peak).toInt
      val u = if (v < 0) v + 65536 else v
      out(2 * i) = (u & 0xff).toByte
      out(2 * i + 1) = ((u >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** DOWNMIX an interleaved-stereo s16le stream (L R L R …) to mono:
    * `m_i = floorDiv(L_i + R_i, 2)` — the telephony two-leg capture →
    * one-model-channel step. Exact integer math (floor keeps both
    * engines identical on odd sums of mixed sign); a trailing
    * incomplete pair (and any odd byte) stays out, mirroring
    * [[stats]]. */
  def stereoDownmix(bytes: Array[Byte]): Array[Byte] = {
    val nPairs = bytes.length / 4
    val out = new Array[Byte](nPairs * 2)
    var i = 0
    while (i < nPairs) {
      def sample(k: Int): Int = {
        val raw = (bytes(2 * k) & 0xff) | ((bytes(2 * k + 1) & 0xff) << 8)
        if (raw < 32768) raw else raw - 65536
      }
      val m = Math.floorDiv(sample(2 * i) + sample(2 * i + 1), 2)
      val u = if (m < 0) m + 65536 else m
      out(2 * i) = (u & 0xff).toByte
      out(2 * i + 1) = ((u >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Extract ONE channel (0 = left, 1 = right) of an interleaved-stereo
    * s16le stream — the per-leg analysis path next to [[stereoDownmix]].
    * A trailing incomplete pair stays out (channel lengths always
    * match). */
  def deinterleave(bytes: Array[Byte], channel: Int): Array[Byte] = {
    val nPairs = bytes.length / 4
    val out = new Array[Byte](nPairs * 2)
    var i = 0
    while (i < nPairs) {
      out(2 * i) = bytes(4 * i + 2 * channel)
      out(2 * i + 1) = bytes(4 * i + 2 * channel + 1)
      i += 1
    }
    out
  }

  /** s16le bytes of the closed-form pseudo-signal
    * `((id·31 + k·7) mod 65536) − 32768` — the [[SynthPcm16Expr]] body;
    * bit-identical to the format_string/unhex formulation it replaces. */
  def synth(id: Long, nSamples: Int): Array[Byte] = {
    val out = new Array[Byte](nSamples * 2)
    var k = 0
    while (k < nSamples) {
      val s = java.lang.Math.floorMod(id * 31 + k.toLong * 7, 65536L) - 32768L
      val u = (if (s < 0) s + 65536L else s).toInt
      out(2 * k) = (u & 0xff).toByte
      out(2 * k + 1) = ((u >> 8) & 0xff).toByte
      k += 1
    }
    out
  }
}

/** Fused per-row PCM16LE statistics: binary → array of 6 longs
  * (n_samples, sum_sq, peak, zero_crossings, n_frames, active_frames).
  * One kernel call per row inside WholeStageCodegen. */
case class PcmStatsExpr(child: Expression, frameSamples: Int, energyThreshold: Long)
  extends UnaryExpression {
  require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pcm_stats requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pcm_stats"

  override def nullSafeEval(b: Any): Any =
    ArrayData.toArrayData(
      PcmKernel.stats(b.asInstanceOf[Array[Byte]], frameSamples, energyThreshold))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.PcmKernel.stats($b, $frameSamples, ${energyThreshold}L));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deterministic s16le synthesis: long id → PCM bytes. */
case class SynthPcm16Expr(child: Expression, nSamples: Int) extends UnaryExpression {
  require(nSamples >= 1, s"nSamples must be >= 1, got $nSamples")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_synth_pcm16 requires a bigint argument, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_synth_pcm16"

  override def nullSafeEval(id: Any): Any =
    PcmKernel.synth(id.asInstanceOf[Long], nSamples)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id =>
      s"${ev.value} = graft.functions.PcmKernel.synth($id, $nSamples);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deterministic integer-ratio linear sample-rate conversion: s16le
  * binary → s16le binary at `toRate`. One fused kernel call per row
  * inside WholeStageCodegen — the zero-shuffle per-row projection shape
  * (stream-safe, embarrassingly parallel at 100 TB). */
case class ResamplePcm16Expr(child: Expression, fromRate: Int, toRate: Int)
  extends UnaryExpression {
  require(fromRate >= 1 && toRate >= 1,
    s"rates must be positive, got $fromRate -> $toRate")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_resample_pcm16 requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_resample_pcm16"

  override def nullSafeEval(b: Any): Any =
    PcmKernel.resample(b.asInstanceOf[Array[Byte]], fromRate, toRate)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.PcmKernel.resample($b, $fromRate, $toRate);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** G.711 µ-law → PCM16LE transcode: one byte per sample in, two bytes
  * per sample out — the telephony codec whose decode is PURE integer
  * math (ITU G.711: complement, unpack sign/exponent/mantissa, bias
  * 0x84), so this audio format is fully real with zero dependencies.
  * Kernel shared by the interpreted and generated paths and by the SQL
  * oracle's formula mirror. */
object MulawKernel {
  /** The canonical ulaw2linear: `~u`; `t = ((u&0x0f)<<3 + 0x84) << exp`;
    * `±(t − 0x84)` by the sign bit. Output range ±32124. */
  def decodeSample(b: Byte): Int = {
    val u = (~b) & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** µ-law byte stream → s16le byte stream. */
  def toPcm16(bytes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val s = decodeSample(bytes(i))
      val u = if (s < 0) s + 65536 else s
      out(2 * i) = (u & 0xff).toByte
      out(2 * i + 1) = ((u >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** The canonical linear2ulaw (Sun g711.c lineage: >>2 to 14 bits,
    * CLIP 8159, BIAS>>2 = 33, segment search over seg_uend
    * {0x3F,0x7F,0xFF,0x1FF,…} = (0x40<<seg)−1): the WRITE path of the
    * telephony codec. `encodeSample(decodeSample(c)) == c` for every
    * code except negative zero 0x7F → 0xFF (both decode to 0 — the
    * canonical-zero collapse), spec-pinned over all 256, plus
    * mid-segment vectors pinning the segment boundaries themselves. */
  def encodeSample(pcm: Int): Byte = {
    var p = pcm >> 2
    val mask = if (p < 0) { p = -p; 0x7f } else 0xff
    if (p > 8159) p = 8159
    p += 33
    var seg = 0
    while (seg < 8 && p > ((0x40 << seg) - 1)) seg += 1
    val u = if (seg >= 8) 0x7f else (seg << 4) | ((p >> (seg + 1)) & 0xf)
    (u ^ mask).toByte
  }

  /** s16le byte stream → µ-law byte stream (two bytes in, one out). Odd
    * trailing bytes stay out, mirroring [[PcmKernel.stats]]. */
  def fromPcm16(bytes: Array[Byte]): Array[Byte] = {
    val n = bytes.length / 2
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val raw = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
      out(i) = encodeSample(if (raw < 32768) raw else raw - 65536)
      i += 1
    }
    out
  }

  /** Deterministic µ-law byte synthesis: `(id·17 + k·11) mod 256` —
    * every byte value is a valid µ-law code, and the closed form lets a
    * SQL oracle regenerate the codes without parsing bytes. */
  def synth(id: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var k = 0
    while (k < n) {
      out(k) = java.lang.Math.floorMod(id * 17 + k.toLong * 11, 256L).toByte
      k += 1
    }
    out
  }
}

/** G.711 A-law → PCM16LE — the European-trunk sibling of [[MulawKernel]]
  * (ITU G.711: XOR 0x55, segment/mantissa unpack; note the INVERTED sign
  * convention vs µ-law — bit 7 set means positive). Pure integer math,
  * zero dependencies. */
object AlawKernel {
  /** Canonical alaw2linear. Output range ±32256. */
  def decodeSample(b: Byte): Int = {
    val v = (b ^ 0x55) & 0xff
    val mant = v & 0x0f
    val seg = (v & 0x70) >> 4
    val t =
      if (seg == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (seg - 1)
    if ((v & 0x80) != 0) t else -t
  }

  /** The canonical linear2alaw (Sun g711.c lineage: >>3 to 13 bits,
    * `-p-1` negative fold, segment table 0x1F..0xFFF, XOR 0x55/0xD5):
    * the WRITE path. Unlike µ-law, `encodeSample(decodeSample(c)) == c`
    * for ALL 256 codes (A-law has no ±0 collapse) — spec-pinned. */
  def encodeSample(pcm: Int): Byte = {
    var p = pcm >> 3
    val mask = if (p >= 0) 0xd5 else { p = -p - 1; 0x55 }
    var seg = 0
    while (seg < 8 && p > (segAEnd(seg))) seg += 1
    val a =
      if (seg >= 8) 0x7f
      else (seg << 4) | (if (seg < 2) (p >> 1) & 0xf else (p >> seg) & 0xf)
    (a ^ mask).toByte
  }
  private val segAEnd = Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)

  /** s16le byte stream → A-law byte stream (two bytes in, one out). */
  def fromPcm16(bytes: Array[Byte]): Array[Byte] = {
    val n = bytes.length / 2
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val raw = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
      out(i) = encodeSample(if (raw < 32768) raw else raw - 65536)
      i += 1
    }
    out
  }

  /** A-law byte stream → s16le byte stream. */
  def toPcm16(bytes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val s = decodeSample(bytes(i))
      val u = if (s < 0) s + 65536 else s
      out(2 * i) = (u & 0xff).toByte
      out(2 * i + 1) = ((u >> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}

/** PCM16LE binary → µ-law binary (the encode/write path), one fused
  * kernel call per row. */
case class MulawFromPcm16Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pcm16_to_mulaw requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pcm16_to_mulaw"
  override def nullSafeEval(b: Any): Any =
    MulawKernel.fromPcm16(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.MulawKernel.fromPcm16($b);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PCM16LE binary → A-law binary (the encode/write path), one fused
  * kernel call per row. */
case class AlawFromPcm16Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pcm16_to_alaw requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pcm16_to_alaw"
  override def nullSafeEval(b: Any): Any =
    AlawKernel.fromPcm16(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.AlawKernel.fromPcm16($b);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** A-law binary → PCM16LE binary, one fused kernel call per row. */
case class AlawToPcm16Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_alaw_to_pcm16 requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_alaw_to_pcm16"
  override def nullSafeEval(b: Any): Any =
    AlawKernel.toPcm16(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.AlawKernel.toPcm16($b);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** µ-law binary → PCM16LE binary, one fused kernel call per row. */
case class MulawToPcm16Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_mulaw_to_pcm16 requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_mulaw_to_pcm16"
  override def nullSafeEval(b: Any): Any =
    MulawKernel.toPcm16(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.MulawKernel.toPcm16($b);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deterministic µ-law synthesis: long id → n µ-law bytes. */
case class SynthMulawExpr(child: Expression, nSamples: Int) extends UnaryExpression {
  require(nSamples >= 1, s"nSamples must be >= 1, got $nSamples")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_synth_mulaw requires a bigint argument, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_synth_mulaw"
  override def nullSafeEval(id: Any): Any =
    MulawKernel.synth(id.asInstanceOf[Long], nSamples)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id =>
      s"${ev.value} = graft.functions.MulawKernel.synth($id, $nSamples);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte-stream frame splitting on a magic signature — the container
  * step of a frame pipeline (concatenated PNG/JPEG streams, MJPEG-style
  * captures): scan for every occurrence of the marker, emit one frame
  * per occurrence running to the next (garbage before the first marker
  * is ignored — a stream picked up mid-capture must not poison the
  * split). Kernel + fused expression, one scan per row. */
object FrameSplitKernel {
  def split(bytes: Array[Byte], magic: Array[Byte]): Array[Array[Byte]] = {
    if (bytes.length < magic.length || magic.length == 0) return Array.empty
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i <= bytes.length - magic.length) {
      var j = 0
      while (j < magic.length && bytes(i + j) == magic(j)) j += 1
      if (j == magic.length) { starts += i; i += magic.length } else i += 1
    }
    val out = new Array[Array[Byte]](starts.length)
    var f = 0
    while (f < starts.length) {
      val end = if (f + 1 < starts.length) starts(f + 1) else bytes.length
      out(f) = java.util.Arrays.copyOfRange(bytes, starts(f), end)
      f += 1
    }
    out
  }
}

/** binary → array<binary> of frames split on `magic`. */
case class SplitByMagicExpr(child: Expression, magic: Seq[Byte]) extends UnaryExpression {
  require(magic.nonEmpty, "magic must be non-empty")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_split_frames requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "graft_split_frames"

  @transient private lazy val magicArr: Array[Byte] = magic.toArray

  override def nullSafeEval(b: Any): Any =
    ArrayData.toArrayData(
      FrameSplitKernel.split(b.asInstanceOf[Array[Byte]], magicArr)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val magicRef = ctx.addReferenceObj("magicBytes", magicArr, "byte[]")
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  (Object[]) graft.functions.FrameSplitKernel.split($b, $magicRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused peak normalization: binary → binary rescaled so max|s| =
  * targetPeak ([[PcmKernel.gainNormalize]] — exact floor-div integer
  * scaling; all-zero streams pass through). */
case class GainNormalizeExpr(child: Expression, targetPeak: Int) extends UnaryExpression {
  require(targetPeak >= 1 && targetPeak <= 32767,
    s"targetPeak out of [1, 32767]: $targetPeak")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pcm16_gain requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pcm16_gain"

  override def nullSafeEval(b: Any): Any =
    PcmKernel.gainNormalize(b.asInstanceOf[Array[Byte]], targetPeak)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.PcmKernel.gainNormalize($b, $targetPeak);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused stereo→mono downmix: binary → binary
  * ([[PcmKernel.stereoDownmix]] — floorDiv average per pair). */
case class StereoDownmixExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_stereo_downmix requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_stereo_downmix"
  override def nullSafeEval(b: Any): Any =
    PcmKernel.stereoDownmix(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.PcmKernel.stereoDownmix($b);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused channel extraction from interleaved stereo: binary → binary
  * ([[PcmKernel.deinterleave]]). */
case class DeinterleaveExpr(child: Expression, channel: Int) extends UnaryExpression {
  require(channel == 0 || channel == 1, s"channel must be 0 or 1, got $channel")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_deinterleave requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_deinterleave"
  override def nullSafeEval(b: Any): Any =
    PcmKernel.deinterleave(b.asInstanceOf[Array[Byte]], channel)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.PcmKernel.deinterleave($b, $channel);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused energy-VAD segmentation: binary → array<long> of flattened
  * (start_frame, span_frames) speech segments — [[PcmKernel.vadSegments]]
  * as one kernel call per row inside WholeStageCodegen. */
case class VadSegmentsExpr(
    child: Expression, frameSamples: Int, energyThreshold: Long,
    maxGapFrames: Int, minSpanFrames: Int) extends UnaryExpression {
  require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
  require(maxGapFrames >= 0, s"maxGapFrames must be >= 0, got $maxGapFrames")
  require(minSpanFrames >= 1, s"minSpanFrames must be >= 1, got $minSpanFrames")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vad_segments requires a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_vad_segments"

  override def nullSafeEval(b: Any): Any =
    ArrayData.toArrayData(PcmKernel.vadSegments(
      b.asInstanceOf[Array[Byte]], frameSamples, energyThreshold,
      maxGapFrames, minSpanFrames))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.PcmKernel.vadSegments(
         |    $b, $frameSamples, ${energyThreshold}L, $maxGapFrames, $minSpanFrames));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcmExpressions {
  /** Frames split on a magic byte signature: binary → array<binary>. */
  def splitFrames(bin: Column, magic: Array[Byte]): Column =
    GraftShims.column(SplitByMagicExpr(GraftShims.expression(bin), magic.toSeq))

  /** µ-law bytes → s16le bytes. */
  def mulawToPcm16(bin: Column): Column =
    GraftShims.column(MulawToPcm16Expr(GraftShims.expression(bin)))

  /** A-law bytes → s16le bytes. */
  def alawToPcm16(bin: Column): Column =
    GraftShims.column(AlawToPcm16Expr(GraftShims.expression(bin)))

  /** s16le bytes → µ-law bytes (the encode/write path). */
  def pcm16ToMulaw(bin: Column): Column =
    GraftShims.column(MulawFromPcm16Expr(GraftShims.expression(bin)))

  /** s16le bytes → A-law bytes (the encode/write path). */
  def pcm16ToAlaw(bin: Column): Column =
    GraftShims.column(AlawFromPcm16Expr(GraftShims.expression(bin)))

  /** Synth µ-law bytes from a long id column. */
  def synthMulaw(id: Column, nSamples: Int): Column =
    GraftShims.column(SynthMulawExpr(GraftShims.expression(id), nSamples))

  /** Fused PCM stats column: array<long> of
    * (n_samples, sum_sq, peak, zero_crossings, n_frames, active_frames). */
  def pcmStats(bin: Column, frameSamples: Int, energyThreshold: Long): Column =
    GraftShims.column(PcmStatsExpr(GraftShims.expression(bin), frameSamples, energyThreshold))

  /** Synth s16le bytes from a long id column. */
  def synthPcm16(id: Column, nSamples: Int): Column =
    GraftShims.column(SynthPcm16Expr(GraftShims.expression(id), nSamples))

  /** Integer-ratio linear resample of s16le bytes (e.g. 8000 → 16000). */
  def resamplePcm16(bin: Column, fromRate: Int, toRate: Int): Column =
    GraftShims.column(ResamplePcm16Expr(GraftShims.expression(bin), fromRate, toRate))

  /** Interleaved-stereo s16le → mono (floorDiv pair average). */
  def stereoDownmix(bin: Column): Column =
    GraftShims.column(StereoDownmixExpr(GraftShims.expression(bin)))

  /** One channel (0 = left, 1 = right) of interleaved-stereo s16le. */
  def deinterleave(bin: Column, channel: Int): Column =
    GraftShims.column(DeinterleaveExpr(GraftShims.expression(bin), channel))

  /** Peak-normalize s16le bytes so max|s| = targetPeak (exact floor-div
    * scaling; all-zero streams pass through). */
  def gainNormalize(bin: Column, targetPeak: Int): Column =
    GraftShims.column(GainNormalizeExpr(GraftShims.expression(bin), targetPeak))

  /** Energy-VAD speech segments: binary → array<long> of flattened
    * (start_frame, span_frames) pairs. */
  def vadSegments(
      bin: Column, frameSamples: Int, energyThreshold: Long,
      maxGapFrames: Int, minSpanFrames: Int): Column =
    GraftShims.column(VadSegmentsExpr(GraftShims.expression(bin),
      frameSamples, energyThreshold, maxGapFrames, minSpanFrames))
}
