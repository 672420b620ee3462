package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale generator's constant-dup-density claim rests on copies
  * being textually DISJOINT — pin the affine cipher's guarantees so a
  * future "simplification" back to a bare shift can't silently
  * reintroduce the k>26 text collision (measured round 10: identical
  * copies 26 apart grew cand_pairs 304× for 10× docs). */
class ScaleGenSpec extends AnyFunSuite {

  test("affineAlpha: copy 0 is the identity") {
    assert(ScaleGen.affineAlpha(0) === "abcdefghijklmnopqrstuvwxyz")
  }

  test("affineAlpha: every map up to 312 is a permutation (injective)") {
    for (i <- 0 until 312)
      assert(ScaleGen.affineAlpha(i).sorted === "abcdefghijklmnopqrstuvwxyz",
        s"copy $i is not a permutation")
  }

  test("affineAlpha: all 312 maps are pairwise distinct") {
    val maps = (0 until 312).map(ScaleGen.affineAlpha)
    assert(maps.distinct.size === 312)
  }

  test("MaxDocCopies is the cipher-times-reversal-group product") {
    assert(ScaleGen.MaxDocCopies === 312 * 4)
  }

  test("embedding (rotation, sign-pattern) pairs are distinct through the bound") {
    // the embedding transform for copy i is (cyclic rotation by i%64,
    // Rademacher signs signsOf(i)) — pairwise-distinct PAIRS mean no
    // two copies apply the same map, the claim every sim-spine
    // artifact's constant-density argument rests on. Pure Scala: no
    // Spark needed to prove it.
    val pairs = (0 until ScaleGen.MaxDocCopies)
      .map(i => (i % 64, ScaleGen.signsOf(i)))
    assert(pairs.distinct.size === ScaleGen.MaxDocCopies)
    // copy 0 is the identity transform
    assert(pairs.head === ((0, Seq.fill(64)(1f))))
  }

  test("EmbDouble's copy indices 1249/1250 are distinct from every ScaleGen copy") {
    // EmbDouble doubles a replica corpus with copy index 1249 (and a
    // second doubling with 1250) — outside ScaleGen's 0..1247 space.
    // Index 1249 shares rotation r = 33 with ~19 existing copies, so
    // its freshness rests entirely on the sign-vector: prove the
    // (rotation, signs) PAIRS collide with none of the 1248
    // in-envelope pairs (the r14 advisor flagged this claim as
    // unproven; now it is the same exhaustive check as the bound).
    val pairs = ((0 until ScaleGen.MaxDocCopies) ++ Seq(1249, 1250))
      .map(i => (i % 64, ScaleGen.signsOf(i)))
    assert(pairs.distinct.size === ScaleGen.MaxDocCopies + 2,
      "an EmbDouble copy's (rotation, signs) pair collides in-envelope")
  }

  test("chained EmbDouble: all four composed transform families are pairwise distinct") {
    // a quadrupled corpus (EmbDouble 1249 then 1250) carries four
    // transform families over the base embeddings — {T_i} and
    // {T1249∘T_i} from the first doubling, then T1250 applied to both
    // halves: {T1250∘T_i} and {T1250∘T1249∘T_i}.
    // The transforms form a group: T=(r,s) acts as
    // y[j] = s[j]·x[(j+r) mod 64], and (T_b∘T_a) = ((r_a+r_b) mod 64,
    // j ↦ s_b[j]·s_a[(j+r_b) mod 64]) — closed, so distinctness of the
    // 4·1248 composed maps is an EXHAUSTIVE check, not a probability
    // argument (the constant-density claim of the ~10M leg rests on no
    // two rows of different families sharing a map).
    def compose(b: (Int, Seq[Float]), a: (Int, Seq[Float])): (Int, Seq[Float]) =
      (((a._1 + b._1) % 64,
        (0 until 64).map(j => b._2(j) * a._2((j + b._1) % 64))))
    def t(i: Int): (Int, Seq[Float]) = (i % 64, ScaleGen.signsOf(i))
    val base = (0 until ScaleGen.MaxDocCopies).map(t)
    val all = base ++
      base.map(compose(t(1249), _)) ++
      base.map(compose(t(1250), _)) ++
      base.map(a => compose(t(1250), compose(t(1249), a)))
    assert(all.distinct.size === 4 * ScaleGen.MaxDocCopies,
      "two composed EmbDouble transform maps coincide")
  }
}
