package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Port of /root/reference/tests/test_page_range.py:1-43. */
class PageRangeSpec extends AnyFunSuite {
  test("plain path returns no range") {
    assert(PageRange.parse("some/file.pdf") == (("some/file.pdf", None)))
  }
  test("range is parsed; single-page range allowed") {
    assert(PageRange.parse("some/file.pdf:2:5") == (("some/file.pdf", Some((2, 5)))))
    assert(PageRange.parse("paper.pdf:3:3") == (("paper.pdf", Some((3, 3)))))
  }
  test("one-colon or non-integer suffix is not a range") {
    assert(PageRange.parse("file.pdf:5") == (("file.pdf:5", None)))
    assert(PageRange.parse("file.pdf:foo:bar") == (("file.pdf:foo:bar", None)))
  }
  test("directory paths and extensionless paths parse") {
    assert(PageRange.parse("/data/papers/study.pdf:10:20") ==
      (("/data/papers/study.pdf", Some((10, 20)))))
    assert(PageRange.parse("myfile:1:4") == (("myfile", Some((1, 4)))))
  }
  test("greedy path match: only the LAST two numeric segments form the range") {
    // regex ^(.+):(\d+):(\d+)$ — same greedy semantics as the reference
    assert(PageRange.parse("a:1:2:3:4") == (("a:1:2", Some((3, 4)))))
  }
}
