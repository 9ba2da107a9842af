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
  *  - a float-tensor INTERPRETER for the feed-forward op subset
  *    (Gather, MatMul incl. batched, Add/Sub/Mul/Div with numpy
  *    broadcasting, Sqrt/Tanh/Relu/Sigmoid/Erf, ReduceMean/ReduceSum,
  *    Softmax, Transpose, Reshape, Constant, Identity) — enough for
  *    embedding-lookup → pooling → dense/activation → normalization
  *    encoders. Attention-block exports needing ops outside the
  *    subset fail FAST with the op name (the honest boundary; wiring
  *    a full runtime stays a one-class swap behind the seam).
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
    case (3, 3) =>
      val Array(bn, n, k) = a.shape; val Array(bn2, k2, m) = b.shape
      require(bn == bn2 && k == k2, s"batched matmul shape mismatch")
      val out = new Array[Float](bn * n * m)
      for (bb <- 0 until bn; i <- 0 until n; j <- 0 until m) {
        var s = 0.0f; var p = 0
        while (p < k) { s += a.data((bb * n + i) * k + p) * b.data((bb * k + p) * m + j); p += 1 }
        out((bb * n + i) * m + j) = s
      }
      Tensor(Array(bn, n, m), out)
    case (x, y) => throw new IllegalArgumentException(s"matmul rank $x × rank $y unsupported")
  }

  private def reduce(a: Tensor, axes0: Seq[Int], keepdims: Boolean,
                     mean: Boolean): Tensor = {
    val n = a.shape.length
    val axes = (if (axes0.isEmpty) a.shape.indices else axes0.map(x => if (x < 0) x + n else x)).toSet
    val outShape0 = a.shape.zipWithIndex.map { case (s, i) => if (axes(i)) 1 else s }
    val st = strides(a.shape); val sto = strides(outShape0)
    val out = new Array[Float](outShape0.product)
    var i = 0
    while (i < a.data.length) {
      var rem = i; var oi = 0; var d = 0
      while (d < n) {
        val idx = rem / st(d); rem %= st(d)
        oi += (if (axes(d)) 0 else idx) * sto(d)
        d += 1
      }
      out(oi) += a.data(i)
      i += 1
    }
    if (mean) {
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

  /** Execute the graph on named input tensors; returns the first graph
    * output. Nodes evaluate in file order (valid for exporter
    * topological order); unsupported ops fail with their name.
    */
  def run(g: Graph, inputs: Map[String, Tensor]): Tensor = {
    val env = scala.collection.mutable.Map[String, Tensor]()
    env ++= g.initializers
    env ++= inputs
    def in(node: Node, i: Int): Tensor =
      env.getOrElse(node.inputs(i), throw new IllegalArgumentException(
        s"${node.opType}: missing input '${node.inputs(i)}'"))
    g.nodes.foreach { node =>
      val out: Tensor = node.opType match {
        case "Identity" => in(node, 0)
        case "Constant" => node.attrs.get("value").flatMap(_.t).getOrElse(
          throw new IllegalArgumentException("Constant without tensor value"))
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
          Tensor(idx.shape ++ data.shape.drop(1), outData)
        case "MatMul"  => matmul(in(node, 0), in(node, 1))
        case "Add"     => elementwise(in(node, 0), in(node, 1), _ + _)
        case "Sub"     => elementwise(in(node, 0), in(node, 1), _ - _)
        case "Mul"     => elementwise(in(node, 0), in(node, 1), _ * _)
        case "Div"     => elementwise(in(node, 0), in(node, 1), _ / _)
        case "Sqrt"    => mapT(in(node, 0), x => math.sqrt(x).toFloat)
        case "Tanh"    => mapT(in(node, 0), x => math.tanh(x).toFloat)
        case "Relu"    => mapT(in(node, 0), x => math.max(x, 0.0f))
        case "Sigmoid" => mapT(in(node, 0), x => (1.0 / (1.0 + math.exp(-x))).toFloat)
        case "Erf"     => mapT(in(node, 0), erf)
        case "ReduceMean" | "ReduceSum" =>
          val axes = if (node.inputs.length > 1) in(node, 1).data.map(_.toInt).toSeq
                     else node.attrs.get("axes").map(_.ints.map(_.toInt)).getOrElse(Seq.empty)
          val keep = node.attrs.get("keepdims").flatMap(_.i).getOrElse(1L) == 1L
          reduce(in(node, 0), axes, keep, mean = node.opType == "ReduceMean")
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
          Tensor(a.shape, out)
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
          Tensor(outShape, out)
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
          Tensor(inferred, a.data)
        case op => throw new IllegalArgumentException(
          s"ONNX op '$op' outside the supported feed-forward subset")
      }
      env(node.outputs.head) = out
    }
    env.getOrElse(g.outputNames.headOption.getOrElse(
        g.nodes.last.outputs.head),
      throw new IllegalStateException("graph produced no output"))
  }
}
