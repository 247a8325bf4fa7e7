package graft.pipeline

/** Pure-JVM signal-processing kernels backing the real multimodal
  * feature encoders ([[Multimodal.featuresStub]] dispatch): an
  * iterative radix-2 FFT for audio spectra and a separable 2-D DCT-II
  * for pHash-style image embeddings. No external DSP library — these
  * run inside `mapPartitions` on executors, so they must be
  * allocation-light and deterministic across JVMs (plain `math.*`
  * double ops only).
  *
  * Reference parallel: questdb ships no media featurization, but its
  * corpus-pipeline role here mirrors what the SURVEY calls the
  * training-data path — embeddings that feed [[Similarity]] ANN.
  */
object Dsp {

  /** In-place iterative radix-2 Cooley–Tukey FFT.
    * `re`/`im` length must be a power of two.
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"fft size $n not a power of two")
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(blk + k); val ui = im(blk + k)
          val vr = re(blk + k + len / 2) * cr - im(blk + k + len / 2) * ci
          val vi = re(blk + k + len / 2) * ci + im(blk + k + len / 2) * cr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + len / 2) = ur - vr; im(blk + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** FFT analysis size for [[spectralEmbed]]. */
  val FftSize = 512

  /** Real audio encoder: average power spectrum over non-overlapping
    * `FftSize`-sample rectangular frames, folded into `dim` contiguous
    * frequency bands over [0, Nyquist), amplitude (sqrt-power) per
    * band, L2-normalized.
    *
    * Rectangular windows + contiguous bands are deliberate: for
    * periodic fixtures whose period divides the frame size the band
    * energies are closed-form (zero spectral leakage), so the encoder
    * is DuckDB-oracle-checkable end-to-end. A Hann/mel front end is a
    * windowing/weighting swap on top of the same FFT.
    *
    * Signals shorter than one frame are zero-padded; a trailing
    * partial frame is dropped (frames are i.i.d. for our fixtures and
    * at corpus scale one partial window is noise).
    */
  def spectralEmbed(samples: Array[Int], dim: Int): Array[Float] = {
    val n = FftSize
    val half = n / 2
    require(dim > 0, s"dim $dim must be positive")
    val power = new Array[Double](half)
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    val frames = math.max(1, samples.length / n)
    var f = 0
    while (f < frames) {
      var i = 0
      while (i < n) {
        val idx = f * n + i
        re(i) = if (idx < samples.length) samples(idx).toDouble else 0.0
        im(i) = 0.0
        i += 1
      }
      fft(re, im)
      i = 0
      while (i < half) { power(i) += re(i) * re(i) + im(i) * im(i); i += 1 }
      f += 1
    }
    // floor-divided band boundaries: exact equal widths when dim | half
    // (the oracle fixtures), still total for any other dim
    val feat = new Array[Float](dim)
    var b = 0
    var norm = 0.0
    while (b < dim) {
      var e = 0.0
      var i = b * half / dim
      while (i < (b + 1) * half / dim) { e += power(i); i += 1 }
      val amp = math.sqrt(e / frames)
      feat(b) = amp.toFloat
      norm += amp * amp
      b += 1
    }
    val nrm = math.sqrt(norm)
    if (nrm > 0) { b = 0; while (b < dim) { feat(b) = (feat(b) / nrm).toFloat; b += 1 } }
    feat
  }

  /** Grid size the image encoder downsamples to before the DCT. */
  val DctGrid = 32

  /** Unnormalized 2-D DCT-II of a `DctGrid`×`DctGrid` grayscale grid:
    * D(u,v) = Σ_x Σ_y g(x,y) cos(π(2x+1)u/2N) cos(π(2y+1)v/2N).
    * Separable: rows then columns, O(N^3) — N=32 so ~65k mults per
    * image, negligible next to the decode.
    */
  def dct2(g: Array[Array[Double]]): Array[Array[Double]] = {
    val n = DctGrid
    val cosTab = Array.tabulate(n, n)((u, x) => math.cos(math.Pi * (2 * x + 1) * u / (2.0 * n)))
    val tmp = Array.ofDim[Double](n, n)
    var y = 0
    while (y < n) {
      var u = 0
      while (u < n) {
        var s = 0.0; var x = 0
        while (x < n) { s += g(x)(y) * cosTab(u)(x); x += 1 }
        tmp(u)(y) = s; u += 1
      }
      y += 1
    }
    val out = Array.ofDim[Double](n, n)
    var u = 0
    while (u < n) {
      var v = 0
      while (v < n) {
        var s = 0.0; y = 0
        while (y < n) { s += tmp(u)(y) * cosTab(v)(y); y += 1 }
        out(u)(v) = s; v += 1
      }
      u += 1
    }
    out
  }

  /** Real image encoder (pHash-family): grayscale-downsample to
    * `DctGrid`², 2-D DCT-II, take the top-left `s`×`s` low-frequency
    * block (s = sqrt(dim)) in row-major (u,v) order, L2-normalize.
    * Feature i = D(u = i/s, v = i%s); D(0,0) (overall brightness)
    * rides as feature 0 so solid images embed as a brightness-signed
    * one-hot.
    */
  def imageEmbed(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    // largest square block that fits; a non-square dim zero-pads the tail
    val s = math.min(math.sqrt(dim).toInt, DctGrid)
    require(dim > 0, s"dim $dim must be positive")
    val n = DctGrid
    // downsample in RGB, then average channels arithmetically —
    // TYPE_BYTE_GRAY would route through a linear-gray ColorConvertOp
    // whose sRGB gamma mapping is not closed-form for the oracle
    val small = new java.awt.image.BufferedImage(n, n, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = small.createGraphics()
    try {
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, n, n, null)
    } finally g2.dispose()
    val grid = Array.ofDim[Double](n, n)
    var x = 0
    while (x < n) {
      var y = 0
      while (y < n) {
        val rgb = small.getRGB(x, y)
        grid(x)(y) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
        y += 1
      }
      x += 1
    }
    val d = dct2(grid)
    val feat = new Array[Float](dim)
    var norm = 0.0
    var i = 0
    while (i < s * s) {
      val c = d(i / s)(i % s)
      feat(i) = c.toFloat
      norm += c * c
      i += 1
    }
    val nrm = math.sqrt(norm)
    if (nrm > 0) { i = 0; while (i < dim) { feat(i) = (feat(i) / nrm).toFloat; i += 1 } }
    feat
  }
}
