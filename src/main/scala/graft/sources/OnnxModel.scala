package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal self-contained ONNX inference for DRIVER-side query
  * encoding — the "real transformer forward pass from a LOCAL model
  * path" half of the [[graft.functions.QueryEncoder]] seam, with zero
  * new dependencies (this container has no onnxruntime jar and no
  * egress; the ONNX format itself is public protobuf, onnx/onnx.proto).
  *
  * Two layers:
  *  - a protobuf WIRE-FORMAT reader for the subset of
  *    ModelProto/GraphProto/NodeProto/TensorProto/AttributeProto an
  *    exported encoder graph uses (field numbers follow the public
  *    onnx.proto; unknown fields are skipped by wire type, so models
  *    carrying metadata/opset/docstrings parse fine);
  *  - a float-tensor INTERPRETER covering feed-forward AND
  *    attention-block encoder exports: Gather, MatMul (N-D batched
  *    with broadcast batch dims — the [heads, seq, dk] and
  *    [batch, heads, seq, dk] shapes a transformer export emits),
  *    Add/Sub/Mul/Div/Pow/Equal/Greater/Less/Where with numpy
  *    broadcasting, Sqrt/Tanh/Relu/Sigmoid/Erf/Neg/Gelu,
  *    ReduceMean/ReduceSum/ReduceMax, fused LayerNormalization,
  *    Softmax, Transpose, Reshape, Shape, Slice (attr- and
  *    input-style), Concat, Split (multi-output), Unsqueeze/Squeeze,
  *    Cast, Expand, ConstantOfShape, Constant, Identity — the op set
  *    a MiniLM-class 1-block self-attention export needs
  *    (embedding + position lookup → LayerNorm → multi-head
  *    QK^T/√dk softmax V → residual/FFN → pooling → L2). Ops outside
  *    the subset still fail FAST with the op name (the honest
  *    boundary; wiring a full runtime stays a one-class swap behind
  *    the seam).
  *
  * Everything is Array[Float] — int64 inputs (token ids) and shape
  * tensors ride the same representation, exact for |v| < 2^24, far
  * above any vocabulary id. Inference runs on the driver (one query
  * string per search; the resulting vector ships to executors as a
  * plan literal, like every probe plan in the engine).
  */
object OnnxModel {

  final case class Tensor(shape: Array[Int], data: Array[Float]) {
    def size: Int = data.length
    require(shape.product == data.length,
      s"tensor shape ${shape.mkString("x")} != data ${data.length}")
  }

  final case class Attr(name: String, i: Option[Long], f: Option[Float],
                        ints: Seq[Long], floats: Seq[Float], t: Option[Tensor])

  final case class Node(opType: String, inputs: Seq[String], outputs: Seq[String],
                        attrs: Map[String, Attr])

  final case class Graph(nodes: Seq[Node], initializers: Map[String, Tensor],
                         inputNames: Seq[String], outputNames: Seq[String])

  // ---------------------------------------------------------------
  // protobuf wire reader
  // ---------------------------------------------------------------

  private final class Reader(buf: ByteBuffer) {
    def hasRemaining: Boolean = buf.hasRemaining
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        b = buf.get() & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def fixed32(): Int = buf.order(ByteOrder.LITTLE_ENDIAN).getInt
    def fixed64(): Long = buf.order(ByteOrder.LITTLE_ENDIAN).getLong
    def bytes(n: Int): Array[Byte] = { val a = new Array[Byte](n); buf.get(a); a }
    def sub(): Reader = {
      val n = varint().toInt
      val slice = buf.slice(); slice.limit(n)
      buf.position(buf.position() + n)
      new Reader(slice)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => fixed64()
      case 2 => { val n = varint().toInt; buf.position(buf.position() + n) }
      case 5 => fixed32()
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def readString(r: Reader): String =
    new String(r.bytes(r.varint().toInt), "UTF-8")

  /** Packed or repeated-scalar numeric field bodies. */
  private def packedLongs(r: Reader): Seq[Long] = {
    val s = r.sub(); val out = Seq.newBuilder[Long]
    while (s.hasRemaining) out += s.varint()
    out.result()
  }
  private def packedFloats(r: Reader): Seq[Float] = {
    val s = r.sub(); val out = Seq.newBuilder[Float]
    while (s.hasRemaining) out += java.lang.Float.intBitsToFloat(s.fixed32())
    out.result()
  }

  private def readTensor(r: Reader): (String, Tensor) = {
    var name = ""
    val dims = Seq.newBuilder[Long]
    var dataType = 1L
    var floats = Array.empty[Float]
    var raw: Array[Byte] = null
    while (r.hasRemaining) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 0) => dims += r.varint()
        case (1, 2) => dims ++= packedLongs(r)
        case (2, 0) => dataType = r.varint()
        case (4, 2) => floats = packedFloats(r).toArray            // float_data
        case (4, 5) => floats :+= java.lang.Float.intBitsToFloat(r.fixed32())
        case (5, 2) => floats = packedLongs(r).map(v => v.toInt.toFloat).toArray // int32_data
        case (5, 0) => floats :+= r.varint().toInt.toFloat
        case (7, 2) => floats = packedLongs(r).map(_.toFloat).toArray // int64_data
        case (7, 0) => floats :+= r.varint().toFloat
        case (8, 2) => name = readString(r)
        case (9, 2) => raw = r.bytes(r.varint().toInt)             // raw_data
        case _      => r.skip(wt)
      }
    }
    if (raw != null) {
      val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      floats = dataType match {
        case 1  => Array.fill(raw.length / 4)(bb.getFloat)
        case 7  => Array.fill(raw.length / 8)(bb.getLong.toFloat)
        case 6  => Array.fill(raw.length / 4)(bb.getInt.toFloat)
        case 11 => Array.fill(raw.length / 8)(bb.getDouble.toFloat)
        case t  => throw new IllegalArgumentException(s"unsupported tensor data_type $t")
      }
    }
    val dimSeq = dims.result()
    val shape = if (dimSeq.isEmpty) Array(1) else dimSeq.map(_.toInt).toArray
    (name, Tensor(shape, floats))
  }

  private def readAttr(r: Reader): Attr = {
    var name = ""; var i: Option[Long] = None; var f: Option[Float] = None
    var ints = Seq.empty[Long]; var floats = Seq.empty[Float]
    var t: Option[Tensor] = None
    while (r.hasRemaining) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 2) => name = readString(r)
        case (2, 5) => f = Some(java.lang.Float.intBitsToFloat(r.fixed32()))
        case (3, 0) => i = Some(r.varint())
        case (5, 2) => t = Some(readTensor(r.sub())._2)
        case (7, 2) => floats = packedFloats(r)
        case (7, 5) => floats :+= java.lang.Float.intBitsToFloat(r.fixed32())
        case (8, 2) => ints = packedLongs(r)
        case (8, 0) => ints :+= r.varint()
        case _      => r.skip(wt)
      }
    }
    Attr(name, i, f, ints, floats, t)
  }

  private def readNode(r: Reader): Node = {
    val ins = Seq.newBuilder[String]; val outs = Seq.newBuilder[String]
    var op = ""; val attrs = Map.newBuilder[String, Attr]
    while (r.hasRemaining) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 2) => ins += readString(r)
        case (2, 2) => outs += readString(r)
        case (4, 2) => op = readString(r)
        case (5, 2) => { val a = readAttr(r.sub()); attrs += a.name -> a }
        case _      => r.skip(wt)
      }
    }
    Node(op, ins.result(), outs.result(), attrs.result())
  }

  private def readValueInfoName(r: Reader): String = {
    var name = ""
    while (r.hasRemaining) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 2) => name = readString(r)
        case _      => r.skip(wt)
      }
    }
    name
  }

  private def readGraph(r: Reader): Graph = {
    val nodes = Seq.newBuilder[Node]
    val inits = Map.newBuilder[String, Tensor]
    val ins = Seq.newBuilder[String]; val outs = Seq.newBuilder[String]
    while (r.hasRemaining) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (1, 2)  => nodes += readNode(r.sub())
        case (5, 2)  => inits += readTensor(r.sub())
        case (11, 2) => ins += readValueInfoName(r.sub())
        case (12, 2) => outs += readValueInfoName(r.sub())
        case _       => r.skip(wt)
      }
    }
    Graph(nodes.result(), inits.result(), ins.result(), outs.result())
  }

  /** Parse a serialized ModelProto file into its graph. */
  def load(path: String): Graph = {
    val r = new Reader(ByteBuffer.wrap(Files.readAllBytes(Paths.get(path))))
    var g: Option[Graph] = None
    while (r.hasRemaining) {
      val key = r.varint(); val field = (key >> 3).toInt; val wt = (key & 7).toInt
      (field, wt) match {
        case (7, 2) => g = Some(readGraph(r.sub()))
        case _      => r.skip(wt)
      }
    }
    g.getOrElse(throw new IllegalArgumentException(s"$path: no graph in ModelProto"))
  }

  // ---------------------------------------------------------------
  // interpreter
  // ---------------------------------------------------------------

  private def broadcastShape(a: Array[Int], b: Array[Int]): Array[Int] = {
    val n = math.max(a.length, b.length)
    val pa = Array.fill(n - a.length)(1) ++ a
    val pb = Array.fill(n - b.length)(1) ++ b
    pa.zip(pb).map { case (x, y) =>
      require(x == y || x == 1 || y == 1,
        s"broadcast mismatch ${a.mkString("x")} vs ${b.mkString("x")}")
      math.max(x, y)
    }
  }

  private def strides(shape: Array[Int]): Array[Int] = {
    val s = new Array[Int](shape.length); var acc = 1
    for (i <- shape.length - 1 to 0 by -1) { s(i) = acc; acc *= shape(i) }
    s
  }

  private def elementwise(a: Tensor, b: Tensor, f: (Float, Float) => Float): Tensor = {
    val outShape = broadcastShape(a.shape, b.shape)
    val n = outShape.length
    val sa = Array.fill(n - a.shape.length)(1) ++ a.shape
    val sb = Array.fill(n - b.shape.length)(1) ++ b.shape
    val (sta, stb, sto) = (strides(sa), strides(sb), strides(outShape))
    val out = new Array[Float](outShape.product)
    var i = 0
    while (i < out.length) {
      var ia = 0; var ib = 0; var rem = i; var d = 0
      while (d < n) {
        val idx = rem / sto(d); rem %= sto(d)
        ia += (if (sa(d) == 1) 0 else idx) * sta(d)
        ib += (if (sb(d) == 1) 0 else idx) * stb(d)
        d += 1
      }
      out(i) = f(a.data(ia), b.data(ib))
      i += 1
    }
    Tensor(outShape, out)
  }

  private def mapT(a: Tensor, f: Float => Float): Tensor =
    Tensor(a.shape, a.data.map(f))

  /** numpy-semantics MatMul: 1D/2D and equal-leading-batch 3D. */
  private def matmul(a: Tensor, b: Tensor): Tensor = (a.shape.length, b.shape.length) match {
    case (1, 2) =>
      val Array(k) = a.shape; val Array(k2, m) = b.shape
      require(k == k2, s"matmul $k vs ${k2}x$m")
      val out = new Array[Float](m)
      var j = 0
      while (j < m) {
        var s = 0.0f; var i = 0
        while (i < k) { s += a.data(i) * b.data(i * m + j); i += 1 }
        out(j) = s; j += 1
      }
      Tensor(Array(m), out)
    case (2, 1) =>
      val Array(n, k) = a.shape; val Array(k2) = b.shape
      require(k == k2)
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        var s = 0.0f; var j = 0
        while (j < k) { s += a.data(i * k + j) * b.data(j); j += 1 }
        out(i) = s; i += 1
      }
      Tensor(Array(n), out)
    case (2, 2) =>
      val Array(n, k) = a.shape; val Array(k2, m) = b.shape
      require(k == k2, s"matmul ${n}x$k vs ${k2}x$m")
      val out = new Array[Float](n * m)
      var i = 0
      while (i < n) {
        var j = 0
        while (j < m) {
          var s = 0.0f; var p = 0
          while (p < k) { s += a.data(i * k + p) * b.data(p * m + j); p += 1 }
          out(i * m + j) = s; j += 1
        }
        i += 1
      }
      Tensor(Array(n, m), out)
    case (x, y) if x >= 2 && y >= 2 =>
      // generic N-D batched matmul with numpy broadcast over the
      // leading (batch) dims — the [heads, seq, dk] / [batch, heads,
      // seq, dk] shapes attention exports emit
      val (n, k) = (a.shape(x - 2), a.shape(x - 1))
      val (k2, m) = (b.shape(y - 2), b.shape(y - 1))
      require(k == k2, s"matmul ${a.shape.mkString("x")} vs ${b.shape.mkString("x")}")
      val batch = broadcastShape(a.shape.dropRight(2), b.shape.dropRight(2))
      val nb = batch.length
      val ba = Array.fill(nb - (x - 2))(1) ++ a.shape.dropRight(2)
      val bbS = Array.fill(nb - (y - 2))(1) ++ b.shape.dropRight(2)
      val (stBatch, stA, stB) = (strides(batch), strides(ba), strides(bbS))
      val nBatch = batch.product
      val out = new Array[Float](nBatch * n * m)
      var bi = 0
      while (bi < nBatch) {
        // map the flat batch index to each side's (broadcast) offset
        var rem = bi; var offA = 0; var offB = 0; var d = 0
        while (d < nb) {
          val idx = rem / stBatch(d); rem %= stBatch(d)
          offA += (if (ba(d) == 1) 0 else idx) * stA(d)
          offB += (if (bbS(d) == 1) 0 else idx) * stB(d)
          d += 1
        }
        val aBase = offA * n * k; val bBase = offB * k * m; val oBase = bi * n * m
        var i = 0
        while (i < n) {
          var j = 0
          while (j < m) {
            var s = 0.0f; var p = 0
            while (p < k) { s += a.data(aBase + i * k + p) * b.data(bBase + p * m + j); p += 1 }
            out(oBase + i * m + j) = s; j += 1
          }
          i += 1
        }
        bi += 1
      }
      Tensor(batch ++ Array(n, m), out)
    case (x, y) => throw new IllegalArgumentException(s"matmul rank $x × rank $y unsupported")
  }

  private def reduce(a: Tensor, axes0: Seq[Int], keepdims: Boolean,
                     kind: String): Tensor = {
    val n = a.shape.length
    val axes = (if (axes0.isEmpty) a.shape.indices else axes0.map(x => if (x < 0) x + n else x)).toSet
    val outShape0 = a.shape.zipWithIndex.map { case (s, i) => if (axes(i)) 1 else s }
    val st = strides(a.shape); val sto = strides(outShape0)
    val isMax = kind == "max"
    val out = Array.fill(outShape0.product)(if (isMax) Float.NegativeInfinity else 0.0f)
    var i = 0
    while (i < a.data.length) {
      var rem = i; var oi = 0; var d = 0
      while (d < n) {
        val idx = rem / st(d); rem %= st(d)
        oi += (if (axes(d)) 0 else idx) * sto(d)
        d += 1
      }
      if (isMax) out(oi) = math.max(out(oi), a.data(i)) else out(oi) += a.data(i)
      i += 1
    }
    if (kind == "mean") {
      val cnt = axes.toSeq.map(a.shape(_)).product
      var j = 0; while (j < out.length) { out(j) /= cnt; j += 1 }
    }
    val shape = if (keepdims) outShape0
                else { val s = a.shape.indices.filterNot(axes).map(a.shape(_)).toArray
                       if (s.isEmpty) Array(1) else s }
    Tensor(shape, out)
  }

  /** Abramowitz & Stegun 7.1.26 erf — the Gelu building block. */
  private def erf(x: Float): Float = {
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    (if (x >= 0) y else -y).toFloat
  }

  /** ONNX Slice: per-axis [start, end) windows with clamping and
    * negative-index wrap; starts/ends/axes read from inputs (opset 10+)
    * or attrs (opset 1). Steps other than 1 are outside the subset.
    */
  private def slice(a: Tensor, starts: Seq[Long], ends: Seq[Long],
                    axes0: Seq[Long], steps: Seq[Long]): Tensor = {
    require(steps.forall(_ == 1L), s"Slice steps ${steps.mkString(",")} unsupported (1 only)")
    val n = a.shape.length
    val axes = if (axes0.isEmpty) starts.indices.map(_.toLong) else axes0
    val lo = a.shape.clone().map(_ => 0)
    val hi = a.shape.clone()
    axes.zipWithIndex.foreach { case (ax0, i) =>
      val ax = (if (ax0 < 0) ax0 + n else ax0).toInt
      val dim = a.shape(ax)
      def norm(v: Long): Int =
        math.max(0L, math.min(dim.toLong, if (v < 0) v + dim else v)).toInt
      lo(ax) = norm(starts(i)); hi(ax) = norm(ends(i))
      require(hi(ax) >= lo(ax), s"Slice empty-negative window on axis $ax")
    }
    val outShape = a.shape.indices.map(d => hi(d) - lo(d)).toArray
    val st = strides(a.shape); val sto = strides(outShape)
    val out = new Array[Float](outShape.product)
    var i = 0
    while (i < out.length) {
      var rem = i; var src = 0; var d = 0
      while (d < n) {
        val idx = rem / sto(d); rem %= sto(d)
        src += (idx + lo(d)) * st(d); d += 1
      }
      out(i) = a.data(src); i += 1
    }
    Tensor(outShape, out)
  }

  private def concat(ts: Seq[Tensor], axis0: Int): Tensor = {
    val n = ts.head.shape.length
    val axis = if (axis0 < 0) axis0 + n else axis0
    ts.foreach(t => require(t.shape.length == n &&
      t.shape.indices.forall(d => d == axis || t.shape(d) == ts.head.shape(d)),
      s"Concat shape mismatch ${ts.map(_.shape.mkString("x")).mkString(" | ")}"))
    val outShape = ts.head.shape.clone()
    outShape(axis) = ts.map(_.shape(axis)).sum
    val outer = ts.head.shape.take(axis).product
    val inner = ts.head.shape.drop(axis + 1).product
    val out = new Array[Float](outShape.product)
    var pos = 0
    var o = 0
    while (o < outer) {
      ts.foreach { t =>
        val len = t.shape(axis) * inner
        System.arraycopy(t.data, o * len, out, pos, len)
        pos += len
      }
      o += 1
    }
    Tensor(outShape, out)
  }

  /** numpy-broadcast ternary select (the Where op). */
  private def where3(c: Tensor, x: Tensor, y: Tensor): Tensor = {
    val outShape = broadcastShape(broadcastShape(c.shape, x.shape), y.shape)
    val n = outShape.length
    def pad(s: Array[Int]) = Array.fill(n - s.length)(1) ++ s
    val (sc, sx, sy) = (pad(c.shape), pad(x.shape), pad(y.shape))
    val (stc, stx, sty, sto) = (strides(sc), strides(sx), strides(sy), strides(outShape))
    val out = new Array[Float](outShape.product)
    var i = 0
    while (i < out.length) {
      var rem = i; var ic = 0; var ix = 0; var iy = 0; var d = 0
      while (d < n) {
        val idx = rem / sto(d); rem %= sto(d)
        ic += (if (sc(d) == 1) 0 else idx) * stc(d)
        ix += (if (sx(d) == 1) 0 else idx) * stx(d)
        iy += (if (sy(d) == 1) 0 else idx) * sty(d)
        d += 1
      }
      out(i) = if (c.data(ic) != 0.0f) x.data(ix) else y.data(iy)
      i += 1
    }
    Tensor(outShape, out)
  }

  /** Fused LayerNormalization (opset 17): normalize over the trailing
    * axes from `axis`, then scale (+ optional bias). Biased variance,
    * f32 accumulation in index order.
    */
  private def layerNorm(x: Tensor, scale: Tensor, bias: Option[Tensor],
                        axis0: Int, eps: Float): Tensor = {
    val n = x.shape.length
    val axis = if (axis0 < 0) axis0 + n else axis0
    val inner = x.shape.drop(axis).product
    val outer = x.size / inner
    val out = new Array[Float](x.size)
    var o = 0
    while (o < outer) {
      val base = o * inner
      var mean = 0.0f; var j = 0
      while (j < inner) { mean += x.data(base + j); j += 1 }
      mean /= inner
      var varAcc = 0.0f; j = 0
      while (j < inner) { val d = x.data(base + j) - mean; varAcc += d * d; j += 1 }
      varAcc /= inner
      val inv = (1.0 / math.sqrt((varAcc + eps).toDouble)).toFloat
      j = 0
      while (j < inner) {
        val v = (x.data(base + j) - mean) * inv * scale.data(j % scale.size)
        out(base + j) = bias.map(b => v + b.data(j % b.size)).getOrElse(v)
        j += 1
      }
      o += 1
    }
    Tensor(x.shape, out)
  }

  /** Execute the graph on named input tensors; returns the first graph
    * output. Nodes evaluate in file order (valid for exporter
    * topological order); unsupported ops fail with their name.
    */
  def run(g: Graph, inputs: Map[String, Tensor]): Tensor = {
    val env = scala.collection.mutable.Map[String, Tensor]()
    env ++= g.initializers
    env ++= inputs
    // declared-but-uncomputed optional outputs (name -> producing op),
    // so a later reader fails naming the producer instead of a bare
    // 'missing input'
    val unbound = scala.collection.mutable.Map[String, String]()
    def in(node: Node, i: Int): Tensor =
      env.getOrElse(node.inputs(i), throw new IllegalArgumentException(
        unbound.get(node.inputs(i))
          .map(op => s"${node.opType}: input '${node.inputs(i)}' is an " +
            s"optional output of $op this interpreter does not compute")
          .getOrElse(s"${node.opType}: missing input '${node.inputs(i)}'")))
    // axes for the Squeeze/Unsqueeze/Reduce families: second input
    // (opset 13+) or the `axes` ints attr (older exports)
    def axesOf(node: Node): Seq[Int] =
      if (node.inputs.length > 1) in(node, 1).data.map(_.toInt).toSeq
      else node.attrs.get("axes").map(_.ints.map(_.toInt)).getOrElse(Seq.empty)
    g.nodes.foreach { node =>
      val outs: Seq[Tensor] = node.opType match {
        case "Identity" => Seq(in(node, 0))
        case "Constant" => Seq(node.attrs.get("value").flatMap(_.t).getOrElse(
          throw new IllegalArgumentException("Constant without tensor value")))
        case "Gather" =>
          val data = in(node, 0); val idx = in(node, 1)
          val axis = node.attrs.get("axis").flatMap(_.i).getOrElse(0L).toInt
          require(axis == 0, s"Gather axis $axis unsupported")
          val rowLen = data.shape.drop(1).product
          val outData = new Array[Float](idx.size * rowLen)
          idx.data.zipWithIndex.foreach { case (v, j) =>
            val r = v.toInt
            require(r >= 0 && r < data.shape(0), s"Gather index $r out of ${data.shape(0)}")
            System.arraycopy(data.data, r * rowLen, outData, j * rowLen, rowLen)
          }
          // a scalar (rank-0 in ONNX, shape [1] here) index selects a
          // row, not a 1×row — but our Tensor floor is rank 1, so a
          // 1-element idx keeps [1, row] which downstream broadcasting
          // treats identically
          Seq(Tensor(idx.shape ++ data.shape.drop(1), outData))
        case "MatMul"  => Seq(matmul(in(node, 0), in(node, 1)))
        case "Add"     => Seq(elementwise(in(node, 0), in(node, 1), _ + _))
        case "Sub"     => Seq(elementwise(in(node, 0), in(node, 1), _ - _))
        case "Mul"     => Seq(elementwise(in(node, 0), in(node, 1), _ * _))
        case "Div"     => Seq(elementwise(in(node, 0), in(node, 1), _ / _))
        case "Pow"     => Seq(elementwise(in(node, 0), in(node, 1),
          (x, y) => math.pow(x, y).toFloat))
        case "Equal"   => Seq(elementwise(in(node, 0), in(node, 1),
          (x, y) => if (x == y) 1.0f else 0.0f))
        case "Greater" => Seq(elementwise(in(node, 0), in(node, 1),
          (x, y) => if (x > y) 1.0f else 0.0f))
        case "Less"    => Seq(elementwise(in(node, 0), in(node, 1),
          (x, y) => if (x < y) 1.0f else 0.0f))
        case "Where"   => Seq(where3(in(node, 0), in(node, 1), in(node, 2)))
        case "Sqrt"    => Seq(mapT(in(node, 0), x => math.sqrt(x).toFloat))
        case "Neg"     => Seq(mapT(in(node, 0), x => -x))
        case "Tanh"    => Seq(mapT(in(node, 0), x => math.tanh(x).toFloat))
        case "Relu"    => Seq(mapT(in(node, 0), x => math.max(x, 0.0f)))
        case "Sigmoid" => Seq(mapT(in(node, 0), x => (1.0 / (1.0 + math.exp(-x))).toFloat))
        case "Erf"     => Seq(mapT(in(node, 0), erf))
        case "Gelu"    =>
          // exact-erf formulation (onnx Gelu default / BERT GELUActivation):
          // 0.5 · x · (1 + erf(x/√2))
          Seq(mapT(in(node, 0), x =>
            (0.5f * x) * (1.0f + erf((x / math.sqrt(2.0)).toFloat))))
        case "Cast" =>
          val to = node.attrs.get("to").flatMap(_.i).getOrElse(1L)
          Seq(to match {
            case 1 | 11 | 10 => in(node, 0)                       // float/double/fp16: identity here
            case 6 | 7 | 12 | 13 => mapT(in(node, 0), x =>        // int32/int64/uint: trunc toward 0
              (if (x < 0) math.ceil(x) else math.floor(x)).toFloat)
            case 9 => mapT(in(node, 0), x => if (x != 0.0f) 1.0f else 0.0f) // bool
            case t => throw new IllegalArgumentException(s"Cast to dtype $t unsupported")
          })
        case "Shape" =>
          val a = in(node, 0)
          Seq(Tensor(Array(a.shape.length), a.shape.map(_.toFloat)))
        case "ConstantOfShape" =>
          val shp = in(node, 0).data.map(_.toInt)
          val fill = node.attrs.get("value").flatMap(_.t).map(_.data(0)).getOrElse(0.0f)
          Seq(Tensor(if (shp.isEmpty) Array(1) else shp,
            Array.fill(math.max(1, shp.product))(fill)))
        case "Expand" =>
          val a = in(node, 0)
          val target = in(node, 1).data.map(_.toInt)
          // numpy-broadcast a to max(shape, target) — ONNX Expand
          // semantics; riding elementwise's broadcast machinery keeps
          // one code path
          Seq(elementwise(a, Tensor(target, new Array[Float](target.product)), (x, _) => x))
        case "Unsqueeze" =>
          val a = in(node, 0)
          val rank = a.shape.length + axesOf(node).length
          val axes = axesOf(node).map(x => if (x < 0) x + rank else x).sorted
          val shape = scala.collection.mutable.ArrayBuffer(a.shape: _*)
          axes.foreach(ax => shape.insert(ax, 1))
          Seq(Tensor(shape.toArray, a.data))
        case "Squeeze" =>
          val a = in(node, 0)
          val axes = axesOf(node).map(x => if (x < 0) x + a.shape.length else x).toSet
          val shape = a.shape.zipWithIndex.collect {
            case (s, i) if !(if (axes.isEmpty) s == 1 else axes(i)) => s }
          Seq(Tensor(if (shape.isEmpty) Array(1) else shape, a.data))
        case "Slice" =>
          val a = in(node, 0)
          if (node.inputs.length > 1) {
            val starts = in(node, 1).data.map(_.toLong).toSeq
            val ends = in(node, 2).data.map(doubleToClampedLong).toSeq
            val axes = if (node.inputs.length > 3) in(node, 3).data.map(_.toLong).toSeq else Seq.empty
            val steps = if (node.inputs.length > 4) in(node, 4).data.map(_.toLong).toSeq else Seq.empty
            Seq(slice(a, starts, ends, axes, steps))
          } else {
            val starts = node.attrs.get("starts").map(_.ints).getOrElse(Seq.empty)
            val ends = node.attrs.get("ends").map(_.ints).getOrElse(Seq.empty)
            val axes = node.attrs.get("axes").map(_.ints).getOrElse(Seq.empty)
            Seq(slice(a, starts, ends, axes, Seq.empty))
          }
        case "Concat" =>
          val axis = node.attrs.get("axis").flatMap(_.i).getOrElse(0L).toInt
          Seq(concat(node.inputs.indices.map(i => in(node, i)), axis))
        case "Split" =>
          val a = in(node, 0)
          val n = a.shape.length
          val axis0 = node.attrs.get("axis").flatMap(_.i).getOrElse(0L).toInt
          val axis = if (axis0 < 0) axis0 + n else axis0
          val sizes: Seq[Int] =
            if (node.inputs.length > 1) in(node, 1).data.map(_.toInt).toSeq
            else node.attrs.get("split").map(_.ints.map(_.toInt)).filter(_.nonEmpty)
              .getOrElse {
                val parts = node.outputs.length
                require(a.shape(axis) % parts == 0,
                  s"Split: dim ${a.shape(axis)} not divisible into $parts equal parts")
                Seq.fill(parts)(a.shape(axis) / parts)
              }
          require(sizes.sum == a.shape(axis),
            s"Split sizes ${sizes.mkString(",")} != dim ${a.shape(axis)}")
          var off = 0L
          sizes.map { sz =>
            val piece = slice(a, Seq(off), Seq(off + sz), Seq(axis.toLong), Seq.empty)
            off += sz; piece
          }
        case "LayerNormalization" =>
          val axis = node.attrs.get("axis").flatMap(_.i).getOrElse(-1L).toInt
          val eps = node.attrs.get("epsilon").flatMap(_.f).getOrElse(1e-5f)
          Seq(layerNorm(in(node, 0), in(node, 1),
            if (node.inputs.length > 2) Some(in(node, 2)) else None, axis, eps))
        case "ReduceMean" | "ReduceSum" | "ReduceMax" =>
          val axes = axesOf(node)
          val keep = node.attrs.get("keepdims").flatMap(_.i).getOrElse(1L) == 1L
          val kind = node.opType match {
            case "ReduceMean" => "mean"; case "ReduceMax" => "max"; case _ => "sum" }
          Seq(reduce(in(node, 0), axes, keep, kind))
        case "Softmax" =>
          val a = in(node, 0)
          val axis0 = node.attrs.get("axis").flatMap(_.i).getOrElse(-1L).toInt
          val axis = if (axis0 < 0) axis0 + a.shape.length else axis0
          require(axis == a.shape.length - 1, s"Softmax axis $axis unsupported (last only)")
          val inner = a.shape.last; val outer = a.size / inner
          val out = new Array[Float](a.size)
          for (o <- 0 until outer) {
            val base = o * inner
            var mx = Float.NegativeInfinity
            for (j <- 0 until inner) mx = math.max(mx, a.data(base + j))
            var s = 0.0
            for (j <- 0 until inner) { out(base + j) = math.exp(a.data(base + j) - mx).toFloat; s += out(base + j) }
            for (j <- 0 until inner) out(base + j) = (out(base + j) / s).toFloat
          }
          Seq(Tensor(a.shape, out))
        case "Transpose" =>
          val a = in(node, 0)
          val perm = node.attrs.get("perm").map(_.ints.map(_.toInt).toArray)
            .getOrElse(a.shape.indices.reverse.toArray)
          val outShape = perm.map(a.shape(_))
          val st = strides(a.shape); val sto = strides(outShape)
          val out = new Array[Float](a.size)
          var i = 0
          while (i < a.size) {
            var rem = i; var src = 0; var d = 0
            while (d < perm.length) {
              val idx = rem / sto(d); rem %= sto(d)
              src += idx * st(perm(d)); d += 1
            }
            out(i) = a.data(src); i += 1
          }
          Seq(Tensor(outShape, out))
        case "Reshape" =>
          val a = in(node, 0); val spec = in(node, 1).data.map(_.toInt)
          val resolved = spec.zipWithIndex.map { case (v, i) =>
            if (v == 0) a.shape(i) else v }
          val inferred = resolved.count(_ == -1) match {
            case 0 => resolved
            case 1 => val known = resolved.filter(_ != -1).product
                      resolved.map(v => if (v == -1) a.size / known else v)
            case _ => throw new IllegalArgumentException("Reshape: multiple -1")
          }
          Seq(Tensor(inferred, a.data))
        case op => throw new IllegalArgumentException(
          s"ONNX op '$op' outside the supported encoder subset")
      }
      // align computed results to the NON-empty declared outputs: an
      // empty name is a skipped optional slot (outputs ["", "y"] with
      // one result binds "y", not the empty slot), and declared
      // optional outputs beyond the computed results (e.g.
      // LayerNormalization's mean/inv-std) stay unbound but RECORDED,
      // so a later reader fails naming the output's producer
      val declared = node.outputs.filter(_.nonEmpty)
      require(declared.nonEmpty && outs.nonEmpty,
        s"${node.opType}: no computed result bindable to declared " +
          s"outputs [${node.outputs.mkString(", ")}]")
      declared.zip(outs).foreach { case (name, t) => env(name) = t }
      declared.drop(outs.length).foreach(name => unbound(name) = node.opType)
    }
    env.getOrElse(g.outputNames.headOption.getOrElse(
        g.nodes.last.outputs.head),
      throw new IllegalStateException("graph produced no output"))
  }

  /** Float → clamped long for shape-arithmetic values riding the float
    * representation: exporters emit INT64_MAX as a Slice end, which is
    * ~9.22e18 as a float — `.toLong` alone would be fine (it clamps),
    * but route every int-ish read through one place.
    */
  private def doubleToClampedLong(f: Float): Long =
    if (f >= Long.MaxValue.toFloat) Long.MaxValue
    else if (f <= Long.MinValue.toFloat) Long.MinValue
    else f.toLong
}
