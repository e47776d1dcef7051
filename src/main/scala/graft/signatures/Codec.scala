package graft.signatures

/** Minimal self-contained image codec for the synthetic corpus — no
  * external image libraries exist in this sandbox (zero egress), so the
  * corpus uses two internally-defined encodings over raw RGB:
  *
  *   - "ppm": PPM-style raw 8-bit RGB (header + w*h*3 bytes)
  *   - "qnt": the same pixels with each channel quantized to 6 bits —
  *     a deterministic stand-in for lossy re-encoding. Max per-channel
  *     error is 3, so PSNR(orig, qnt) >= 10*log10(255^2/9) ≈ 38.6 dB
  *     worst-case and ≈ 43 dB for uniform error — above the 40 dB gate
  *     for the generated corpus (asserted in tests).
  *
  * In production the decode step would be an image library behind the
  * same `decode(bytes, fmt): Array[Byte]` seam (see
  * graft.multimodal.BinaryPipeline for the pluggable stub).
  */
object Codec {

  /** Encode raw RGB pixels (length w*h*3) as "ppm" bytes. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val header = s"P6 $w $h 255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Encode with 6-bit channel quantization ("qnt"). */
  def encodeQnt(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val q = new Array[Byte](rgb.length)
    var i = 0
    while (i < rgb.length) { q(i) = ((rgb(i) & 0xfc)).toByte; i += 1 }
    val header = s"Q6 $w $h 255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + q.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(q, 0, out, header.length, q.length)
    out
  }

  /** Decode either format back to raw RGB (length w*h*3). */
  def decode(bytes: Array[Byte], fmt: String): Array[Byte] = {
    var i = 0
    var newlines = 0
    while (i < bytes.length && newlines == 0) {
      if (bytes(i) == '\n') newlines = 1 else i += 1
    }
    java.util.Arrays.copyOfRange(bytes, i + 1, bytes.length)
  }

  /** PSNR in dB between two equal-length raw pixel arrays; infinite
    * (1e9) for identical arrays. Formula: 10*log10(MAX^2 / MSE).
    */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.length != b.length || a.length == 0) return 0.0
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      se += d.toDouble * d
      i += 1
    }
    val mse = se / a.length
    if (mse == 0.0) 1e9 else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** 64-bit average-hash perceptual hash: downsample luminance to 8x8
    * block means, bit i set iff block i is above the mean — consistent
    * with the synthetic generator so `phash` column matches `bytes`.
    */
  def phash(w: Int, h: Int, rgb: Array[Byte]): Long = {
    val lum = new Array[Double](64)
    val cnt = new Array[Int](64)
    var y = 0
    while (y < h) {
      val by = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val bx = math.min(7, x * 8 / w)
        val p = (y * w + x) * 3
        val l = 0.299 * (rgb(p) & 0xff) + 0.587 * (rgb(p + 1) & 0xff) + 0.114 * (rgb(p + 2) & 0xff)
        lum(by * 8 + bx) += l
        cnt(by * 8 + bx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    var mean = 0.0
    while (i < 64) { lum(i) = if (cnt(i) == 0) 0 else lum(i) / cnt(i); mean += lum(i); i += 1 }
    mean /= 64
    var bits = 0L
    i = 0
    while (i < 64) { if (lum(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }
}
