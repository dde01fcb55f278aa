package graft.cef

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property suite for the small algebraic components — the
  * generation/shrinking complement to the seeded randomized equivalence
  * suites (the reference keeps custom generators; these are the pieces
  * with clean algebraic specs).
  */
object PropertySpec extends Properties("graft.cef") {

  property("SymbolBuffer = takeRight(size).reverse of push history") = {
    val ops = for {
      size <- Gen.choose(1, 6)
      pushes <- Gen.listOf(Gen.choose(0, 9))
    } yield (size, pushes)
    forAll(ops) { case (size, pushes) =>
      val b = new SymbolBuffer(size)
      pushes.foreach(b.push)
      b.pop == pushes.takeRight(size).reverse &&
        b.isFull == (pushes.size >= size)
    }
  }

  property("Cst counters monotone along prefixes") = {
    val words = Gen.listOf(Gen.nonEmptyListOf(Gen.choose(0, 3)).map(_.take(4)))
    forAll(words) { ws =>
      val cst = new Cst
      ws.foreach(w => cst.add(w))
      cst.count == ws.size &&
        ws.forall { w =>
          (1 until w.size).forall(k =>
            cst.counterFor(w.take(k + 1)) <= cst.counterFor(w.take(k))) &&
            cst.counterFor(w) >= 1L
        }
    }
  }

  private val statsGen = for {
    tp <- Gen.choose(0L, 100L); tn <- Gen.choose(0L, 100L)
    fp <- Gen.choose(0L, 100L); fn <- Gen.choose(0L, 100L)
  } yield ClassStats(tp, tn, fp, fn)

  property("ClassStats + is associative/commutative, MCC bounded") =
    forAll(statsGen, statsGen, statsGen) { (a, b, c) =>
      (a + b) == (b + a) &&
        ((a + b) + c) == (a + (b + c)) &&
        a.mcc >= -1.0 && a.mcc <= 1.0
    }

  property("angleDiffDeg lands in (-180,180] and is antisymmetric") = {
    val deg = Gen.choose(-720.0, 720.0)
    forAll(deg, deg) { (a, b) =>
      val d = Spatial.angleDiffDeg(a, b)
      val inRange = d > -180.0 - 1e-9 && d <= 180.0 + 1e-9
      val anti =
        if (math.abs(d) < 1e-9 || math.abs(math.abs(d) - 180.0) < 1e-9) true
        else math.abs(Spatial.angleDiffDeg(b, a) + d) < 1e-9
      inRange && anti
    }
  }

  property("classifyNextK probability monotone in k") = {
    val dists = Gen.listOfN(8, Gen.choose(0.0, 1.0)).map { raw =>
      val s = math.max(raw.sum, 1e-9)
      WtDistribution(raw.zipWithIndex.map { case (p, i) => (i + 1) -> p / s }.toMap)
    }
    forAll(dists) { wt =>
      (1 until 8).forall(k =>
        wt.classifyNextK(0.5, k).prob <= wt.classifyNextK(0.5, k + 1).prob + 1e-12)
    }
  }

  property("minterm evaluation is a total function on events") = {
    val evGen = for {
      t <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0.0, 200.0)
    } yield CEvent(1, t, 1, "", Map("value" -> v), Map.empty)
    val iso = Isomorphism.build(
      Set(Predicate.IsEventType("a"), Predicate.IsEventType("b"),
        Predicate.GT("value", 100.0), Predicate.True),
      Set.empty)
    forAll(evGen) { e =>
      val sym = iso.evaluate(e)
      sym >= 0 && sym < iso.size && iso.sentenceOf(sym).eval(e)
    }
  }

  property("interval-pruned alphabet is exactly the real-realizable assignments") = {
    // random comparison predicates over two attributes; for every
    // real-valued event the evaluated assignment must have a minterm, and
    // that minterm must state exactly the event's predicate truth values
    val predGen: Gen[Predicate] = for {
      attr <- Gen.oneOf("x", "y")
      v <- Gen.choose(0, 10).map(_ * 10.0)
      p <- Gen.oneOf[Predicate](
        Predicate.GT(attr, v), Predicate.GTE(attr, v), Predicate.LT(attr, v),
        Predicate.LTE(attr, v), Predicate.EQ(attr, v), Predicate.BT(attr, v, v + 25.0))
    } yield p
    val caseGen = for {
      preds <- Gen.listOfN(6, predGen).map(_.toSet)
      xs <- Gen.listOfN(10, Gen.choose(-5.0, 115.0))
      ys <- Gen.listOfN(10, Gen.choose(-5.0, 115.0))
      // include the predicate constants themselves (boundary values)
    } yield (preds, xs ++ preds.toList.collect { case Predicate.GT(_, v) => v
      case Predicate.LT(_, v) => v case Predicate.EQ(_, v) => v }, ys)
    forAll(caseGen) { case (preds, xs, ys) =>
      val iso = Isomorphism.build(preds, Set.empty)
      xs.zipAll(ys, 0.0, 0.0).forall { case (x, y) =>
        val e = CEvent(1, "t", 1, "", Map("x" -> x, "y" -> y), Map.empty)
        val sym = iso.evaluate(e)
        sym >= 0 && iso.minterms(sym) == iso.predicates.map(p => p -> p.eval(e)).toMap
      }
    }
  }
}
