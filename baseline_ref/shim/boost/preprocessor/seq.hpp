// Mini Boost.Preprocessor shim: exactly the macros the reference IKFoM
// toolkit's MTK_BUILD_MANIFOLD machinery uses (mtk/build_manifold.hpp,
// mtk/startIdx.hpp), reimplemented for bounded sequence sizes (<=24) and
// BOOST_PP_FOR depth (<=30).  Behavior matches Boost for these use sites.
#pragma once
#include <boost/preprocessor/cat.hpp>

/* ---------------- arithmetic / logic ---------------- */
#define BOOST_PP_DEC(n) BOOST_PP_CAT(BOOST_PP_DEC_, n)
#define BOOST_PP_DEC_1 0
#define BOOST_PP_DEC_2 1
#define BOOST_PP_DEC_3 2
#define BOOST_PP_DEC_4 3
#define BOOST_PP_DEC_5 4
#define BOOST_PP_DEC_6 5
#define BOOST_PP_DEC_7 6
#define BOOST_PP_DEC_8 7
#define BOOST_PP_DEC_9 8
#define BOOST_PP_DEC_10 9
#define BOOST_PP_DEC_11 10
#define BOOST_PP_DEC_12 11
#define BOOST_PP_DEC_13 12
#define BOOST_PP_DEC_14 13
#define BOOST_PP_DEC_15 14
#define BOOST_PP_DEC_16 15
#define BOOST_PP_DEC_17 16
#define BOOST_PP_DEC_18 17
#define BOOST_PP_DEC_19 18
#define BOOST_PP_DEC_20 19
#define BOOST_PP_DEC_21 20
#define BOOST_PP_DEC_22 21
#define BOOST_PP_DEC_23 22
#define BOOST_PP_DEC_24 23

#define BOOST_PP_BOOL(n) BOOST_PP_CAT(BOOST_PP_BOOL_, n)
#define BOOST_PP_BOOL_0 0
#define BOOST_PP_BOOL_1 1
#define BOOST_PP_BOOL_2 1
#define BOOST_PP_BOOL_3 1
#define BOOST_PP_BOOL_4 1
#define BOOST_PP_BOOL_5 1
#define BOOST_PP_BOOL_6 1
#define BOOST_PP_BOOL_7 1
#define BOOST_PP_BOOL_8 1
#define BOOST_PP_BOOL_9 1
#define BOOST_PP_BOOL_10 1
#define BOOST_PP_BOOL_11 1
#define BOOST_PP_BOOL_12 1
#define BOOST_PP_BOOL_13 1
#define BOOST_PP_BOOL_14 1
#define BOOST_PP_BOOL_15 1
#define BOOST_PP_BOOL_16 1
#define BOOST_PP_BOOL_17 1
#define BOOST_PP_BOOL_18 1
#define BOOST_PP_BOOL_19 1
#define BOOST_PP_BOOL_20 1
#define BOOST_PP_BOOL_21 1
#define BOOST_PP_BOOL_22 1
#define BOOST_PP_BOOL_23 1
#define BOOST_PP_BOOL_24 1

#define BOOST_PP_IIF(c, t, f) BOOST_PP_CAT(BOOST_PP_IIF_, c)(t, f)
#define BOOST_PP_IIF_0(t, f) f
#define BOOST_PP_IIF_1(t, f) t
#define BOOST_PP_IF(c, t, f) BOOST_PP_IIF(BOOST_PP_BOOL(c), t, f)

/* ---------------- tuples ---------------- */
#define BOOST_PP_TUPLE_REM_2(e0, e1) e0, e1
#define BOOST_PP_TUPLE_ELEM_2_0(e0, e1) e0
#define BOOST_PP_TUPLE_ELEM_4_0(e0, e1, e2, e3) e0

/* ---------------- sequences ---------------- */
#define BOOST_PP_SEQ_SIZE(seq) \
  BOOST_PP_CAT(BOOST_PP_SEQ_SIZE_, BOOST_PP_SEQ_SIZE_0 seq)
#define BOOST_PP_SEQ_SIZE_0(...) BOOST_PP_SEQ_SIZE_1
#define BOOST_PP_SEQ_SIZE_1(...) BOOST_PP_SEQ_SIZE_2
#define BOOST_PP_SEQ_SIZE_2(...) BOOST_PP_SEQ_SIZE_3
#define BOOST_PP_SEQ_SIZE_3(...) BOOST_PP_SEQ_SIZE_4
#define BOOST_PP_SEQ_SIZE_4(...) BOOST_PP_SEQ_SIZE_5
#define BOOST_PP_SEQ_SIZE_5(...) BOOST_PP_SEQ_SIZE_6
#define BOOST_PP_SEQ_SIZE_6(...) BOOST_PP_SEQ_SIZE_7
#define BOOST_PP_SEQ_SIZE_7(...) BOOST_PP_SEQ_SIZE_8
#define BOOST_PP_SEQ_SIZE_8(...) BOOST_PP_SEQ_SIZE_9
#define BOOST_PP_SEQ_SIZE_9(...) BOOST_PP_SEQ_SIZE_10
#define BOOST_PP_SEQ_SIZE_10(...) BOOST_PP_SEQ_SIZE_11
#define BOOST_PP_SEQ_SIZE_11(...) BOOST_PP_SEQ_SIZE_12
#define BOOST_PP_SEQ_SIZE_12(...) BOOST_PP_SEQ_SIZE_13
#define BOOST_PP_SEQ_SIZE_13(...) BOOST_PP_SEQ_SIZE_14
#define BOOST_PP_SEQ_SIZE_14(...) BOOST_PP_SEQ_SIZE_15
#define BOOST_PP_SEQ_SIZE_15(...) BOOST_PP_SEQ_SIZE_16
#define BOOST_PP_SEQ_SIZE_16(...) BOOST_PP_SEQ_SIZE_17
#define BOOST_PP_SEQ_SIZE_17(...) BOOST_PP_SEQ_SIZE_18
#define BOOST_PP_SEQ_SIZE_18(...) BOOST_PP_SEQ_SIZE_19
#define BOOST_PP_SEQ_SIZE_19(...) BOOST_PP_SEQ_SIZE_20
#define BOOST_PP_SEQ_SIZE_20(...) BOOST_PP_SEQ_SIZE_21
#define BOOST_PP_SEQ_SIZE_21(...) BOOST_PP_SEQ_SIZE_22
#define BOOST_PP_SEQ_SIZE_22(...) BOOST_PP_SEQ_SIZE_23
#define BOOST_PP_SEQ_SIZE_23(...) BOOST_PP_SEQ_SIZE_24
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_0 0
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_1 1
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_2 2
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_3 3
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_4 4
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_5 5
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_6 6
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_7 7
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_8 8
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_9 9
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_10 10
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_11 11
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_12 12
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_13 13
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_14 14
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_15 15
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_16 16
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_17 17
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_18 18
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_19 19
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_20 20
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_21 21
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_22 22
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_23 23
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_24 24

#define BOOST_PP_SEQ_HEAD(seq) BOOST_PP_SEQ_HEAD_X((BOOST_PP_SEQ_HEAD_A seq))
#define BOOST_PP_SEQ_HEAD_A(...) __VA_ARGS__,
#define BOOST_PP_SEQ_HEAD_X(p) BOOST_PP_SEQ_HEAD_Y p
#define BOOST_PP_SEQ_HEAD_Y(head, ...) head

#define BOOST_PP_SEQ_TAIL(seq) BOOST_PP_SEQ_TAIL_I seq
#define BOOST_PP_SEQ_TAIL_I(...)

/* SEQ_ENUM: comma-separate the elements */
#define BOOST_PP_SEQ_ENUM(seq) \
  BOOST_PP_CAT(BOOST_PP_SEQ_ENUM_, BOOST_PP_SEQ_SIZE(seq)) seq
#define BOOST_PP_SEQ_ENUM_1(...) __VA_ARGS__
#define BOOST_PP_SEQ_ENUM_2(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_1
#define BOOST_PP_SEQ_ENUM_3(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_2
#define BOOST_PP_SEQ_ENUM_4(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_3
#define BOOST_PP_SEQ_ENUM_5(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_4
#define BOOST_PP_SEQ_ENUM_6(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_5
#define BOOST_PP_SEQ_ENUM_7(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_6
#define BOOST_PP_SEQ_ENUM_8(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_7
#define BOOST_PP_SEQ_ENUM_9(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_8
#define BOOST_PP_SEQ_ENUM_10(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_9
#define BOOST_PP_SEQ_ENUM_11(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_10
#define BOOST_PP_SEQ_ENUM_12(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_11
#define BOOST_PP_SEQ_ENUM_13(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_12
#define BOOST_PP_SEQ_ENUM_14(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_13
#define BOOST_PP_SEQ_ENUM_15(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_14
#define BOOST_PP_SEQ_ENUM_16(...) __VA_ARGS__, BOOST_PP_SEQ_ENUM_15

/* SEQ_FOR_EACH_R: juxtapose macro(r, data, elem) for each element */
#define BOOST_PP_SEQ_FOR_EACH_R(r, m, d, seq) \
  BOOST_PP_CAT(BOOST_PP_SEQ_FE_, BOOST_PP_SEQ_SIZE(seq))(m, d, seq)
#define BOOST_PP_SEQ_FE_0(m, d, seq)
#define BOOST_PP_SEQ_FE_1(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq))
#define BOOST_PP_SEQ_FE_2(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_1(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_3(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_2(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_4(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_3(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_5(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_4(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_6(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_5(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_7(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_6(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_8(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_7(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_9(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_8(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_10(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_9(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_11(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_10(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_12(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_11(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_13(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_12(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_14(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_13(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_15(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_14(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_16(m, d, seq) m(2, d, BOOST_PP_SEQ_HEAD(seq)) BOOST_PP_SEQ_FE_15(m, d, BOOST_PP_SEQ_TAIL(seq))

/* SEQ_TRANSFORM_S: produce a sequence of op(s, data, elem) */
#define BOOST_PP_SEQ_TRANSFORM_S(s, op, d, seq) \
  BOOST_PP_CAT(BOOST_PP_SEQ_TR_, BOOST_PP_SEQ_SIZE(seq))(op, d, seq)
#define BOOST_PP_SEQ_TR_1(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq)))
#define BOOST_PP_SEQ_TR_2(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_1(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_3(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_2(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_4(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_3(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_5(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_4(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_6(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_5(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_7(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_6(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_8(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_7(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_9(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_8(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_10(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_9(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_11(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_10(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_12(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_11(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_13(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_12(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_14(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_13(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_15(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_14(op, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_TR_16(op, d, seq) (op(2, d, BOOST_PP_SEQ_HEAD(seq))) BOOST_PP_SEQ_TR_15(op, d, BOOST_PP_SEQ_TAIL(seq))

/* BOOST_PP_FOR (reentrant depths 1..30) */
#define BOOST_PP_FOR_STEP(n, s, p, o, m) \
  BOOST_PP_CAT(BOOST_PP_FOR_, n)(s, p, o, m)

#define BOOST_PP_FOR_1(s, p, o, m) BOOST_PP_FOR_1_C(BOOST_PP_BOOL(p(2, s)), s, p, o, m)
#define BOOST_PP_FOR_1_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_1_, c)(s, p, o, m)
#define BOOST_PP_FOR_1_0(s, p, o, m)
#define BOOST_PP_FOR_1_1(s, p, o, m) m(2, s) BOOST_PP_FOR_2(o(2, s), p, o, m)

#define BOOST_PP_FOR_2(s, p, o, m) BOOST_PP_FOR_2_C(BOOST_PP_BOOL(p(3, s)), s, p, o, m)
#define BOOST_PP_FOR_2_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_2_, c)(s, p, o, m)
#define BOOST_PP_FOR_2_0(s, p, o, m)
#define BOOST_PP_FOR_2_1(s, p, o, m) m(3, s) BOOST_PP_FOR_3(o(3, s), p, o, m)

#define BOOST_PP_FOR_3(s, p, o, m) BOOST_PP_FOR_3_C(BOOST_PP_BOOL(p(4, s)), s, p, o, m)
#define BOOST_PP_FOR_3_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_3_, c)(s, p, o, m)
#define BOOST_PP_FOR_3_0(s, p, o, m)
#define BOOST_PP_FOR_3_1(s, p, o, m) m(4, s) BOOST_PP_FOR_4(o(4, s), p, o, m)

#define BOOST_PP_FOR_4(s, p, o, m) BOOST_PP_FOR_4_C(BOOST_PP_BOOL(p(5, s)), s, p, o, m)
#define BOOST_PP_FOR_4_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_4_, c)(s, p, o, m)
#define BOOST_PP_FOR_4_0(s, p, o, m)
#define BOOST_PP_FOR_4_1(s, p, o, m) m(5, s) BOOST_PP_FOR_5(o(5, s), p, o, m)

#define BOOST_PP_FOR_5(s, p, o, m) BOOST_PP_FOR_5_C(BOOST_PP_BOOL(p(6, s)), s, p, o, m)
#define BOOST_PP_FOR_5_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_5_, c)(s, p, o, m)
#define BOOST_PP_FOR_5_0(s, p, o, m)
#define BOOST_PP_FOR_5_1(s, p, o, m) m(6, s) BOOST_PP_FOR_6(o(6, s), p, o, m)

#define BOOST_PP_FOR_6(s, p, o, m) BOOST_PP_FOR_6_C(BOOST_PP_BOOL(p(7, s)), s, p, o, m)
#define BOOST_PP_FOR_6_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_6_, c)(s, p, o, m)
#define BOOST_PP_FOR_6_0(s, p, o, m)
#define BOOST_PP_FOR_6_1(s, p, o, m) m(7, s) BOOST_PP_FOR_7(o(7, s), p, o, m)

#define BOOST_PP_FOR_7(s, p, o, m) BOOST_PP_FOR_7_C(BOOST_PP_BOOL(p(8, s)), s, p, o, m)
#define BOOST_PP_FOR_7_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_7_, c)(s, p, o, m)
#define BOOST_PP_FOR_7_0(s, p, o, m)
#define BOOST_PP_FOR_7_1(s, p, o, m) m(8, s) BOOST_PP_FOR_8(o(8, s), p, o, m)

#define BOOST_PP_FOR_8(s, p, o, m) BOOST_PP_FOR_8_C(BOOST_PP_BOOL(p(9, s)), s, p, o, m)
#define BOOST_PP_FOR_8_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_8_, c)(s, p, o, m)
#define BOOST_PP_FOR_8_0(s, p, o, m)
#define BOOST_PP_FOR_8_1(s, p, o, m) m(9, s) BOOST_PP_FOR_9(o(9, s), p, o, m)

#define BOOST_PP_FOR_9(s, p, o, m) BOOST_PP_FOR_9_C(BOOST_PP_BOOL(p(10, s)), s, p, o, m)
#define BOOST_PP_FOR_9_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_9_, c)(s, p, o, m)
#define BOOST_PP_FOR_9_0(s, p, o, m)
#define BOOST_PP_FOR_9_1(s, p, o, m) m(10, s) BOOST_PP_FOR_10(o(10, s), p, o, m)

#define BOOST_PP_FOR_10(s, p, o, m) BOOST_PP_FOR_10_C(BOOST_PP_BOOL(p(11, s)), s, p, o, m)
#define BOOST_PP_FOR_10_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_10_, c)(s, p, o, m)
#define BOOST_PP_FOR_10_0(s, p, o, m)
#define BOOST_PP_FOR_10_1(s, p, o, m) m(11, s) BOOST_PP_FOR_11(o(11, s), p, o, m)

#define BOOST_PP_FOR_11(s, p, o, m) BOOST_PP_FOR_11_C(BOOST_PP_BOOL(p(12, s)), s, p, o, m)
#define BOOST_PP_FOR_11_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_11_, c)(s, p, o, m)
#define BOOST_PP_FOR_11_0(s, p, o, m)
#define BOOST_PP_FOR_11_1(s, p, o, m) m(12, s) BOOST_PP_FOR_12(o(12, s), p, o, m)

#define BOOST_PP_FOR_12(s, p, o, m) BOOST_PP_FOR_12_C(BOOST_PP_BOOL(p(13, s)), s, p, o, m)
#define BOOST_PP_FOR_12_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_12_, c)(s, p, o, m)
#define BOOST_PP_FOR_12_0(s, p, o, m)
#define BOOST_PP_FOR_12_1(s, p, o, m) m(13, s) BOOST_PP_FOR_13(o(13, s), p, o, m)

#define BOOST_PP_FOR_13(s, p, o, m) BOOST_PP_FOR_13_C(BOOST_PP_BOOL(p(14, s)), s, p, o, m)
#define BOOST_PP_FOR_13_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_13_, c)(s, p, o, m)
#define BOOST_PP_FOR_13_0(s, p, o, m)
#define BOOST_PP_FOR_13_1(s, p, o, m) m(14, s) BOOST_PP_FOR_14(o(14, s), p, o, m)

#define BOOST_PP_FOR_14(s, p, o, m) BOOST_PP_FOR_14_C(BOOST_PP_BOOL(p(15, s)), s, p, o, m)
#define BOOST_PP_FOR_14_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_14_, c)(s, p, o, m)
#define BOOST_PP_FOR_14_0(s, p, o, m)
#define BOOST_PP_FOR_14_1(s, p, o, m) m(15, s) BOOST_PP_FOR_15(o(15, s), p, o, m)

#define BOOST_PP_FOR_15(s, p, o, m) BOOST_PP_FOR_15_C(BOOST_PP_BOOL(p(16, s)), s, p, o, m)
#define BOOST_PP_FOR_15_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_15_, c)(s, p, o, m)
#define BOOST_PP_FOR_15_0(s, p, o, m)
#define BOOST_PP_FOR_15_1(s, p, o, m) m(16, s) BOOST_PP_FOR_16(o(16, s), p, o, m)

#define BOOST_PP_FOR_16(s, p, o, m) BOOST_PP_FOR_16_C(BOOST_PP_BOOL(p(17, s)), s, p, o, m)
#define BOOST_PP_FOR_16_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_16_, c)(s, p, o, m)
#define BOOST_PP_FOR_16_0(s, p, o, m)
#define BOOST_PP_FOR_16_1(s, p, o, m) m(17, s) BOOST_PP_FOR_17(o(17, s), p, o, m)

#define BOOST_PP_FOR_17(s, p, o, m) BOOST_PP_FOR_17_C(BOOST_PP_BOOL(p(18, s)), s, p, o, m)
#define BOOST_PP_FOR_17_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_17_, c)(s, p, o, m)
#define BOOST_PP_FOR_17_0(s, p, o, m)
#define BOOST_PP_FOR_17_1(s, p, o, m) m(18, s) BOOST_PP_FOR_18(o(18, s), p, o, m)

#define BOOST_PP_FOR_18(s, p, o, m) BOOST_PP_FOR_18_C(BOOST_PP_BOOL(p(19, s)), s, p, o, m)
#define BOOST_PP_FOR_18_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_18_, c)(s, p, o, m)
#define BOOST_PP_FOR_18_0(s, p, o, m)
#define BOOST_PP_FOR_18_1(s, p, o, m) m(19, s) BOOST_PP_FOR_19(o(19, s), p, o, m)

#define BOOST_PP_FOR_19(s, p, o, m) BOOST_PP_FOR_19_C(BOOST_PP_BOOL(p(20, s)), s, p, o, m)
#define BOOST_PP_FOR_19_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_19_, c)(s, p, o, m)
#define BOOST_PP_FOR_19_0(s, p, o, m)
#define BOOST_PP_FOR_19_1(s, p, o, m) m(20, s) BOOST_PP_FOR_20(o(20, s), p, o, m)

#define BOOST_PP_FOR_20(s, p, o, m) BOOST_PP_FOR_20_C(BOOST_PP_BOOL(p(21, s)), s, p, o, m)
#define BOOST_PP_FOR_20_C(c, s, p, o, m) BOOST_PP_CAT(BOOST_PP_FOR_20_, c)(s, p, o, m)
#define BOOST_PP_FOR_20_0(s, p, o, m)
#define BOOST_PP_FOR_20_1(s, p, o, m) m(21, s) BOOST_PP_FOR_ERROR_DEPTH_EXCEEDED
