"""Execution smoke for EVERY ClickHouse spelling the rewriter knows.

283 function spellings are registered in ``select_funcs.RULES`` /
``_PARAMETRIC``; before this test only ~55% were ever executed by a
test or registered query — a rule emitting invalid Spark SQL for an
untested arity would surface for the first time in a user's query.
Here every spelling has one canonical example that is REWRITTEN AND
RUN; deterministic examples are value-asserted.  A completeness check
fails the suite when a new rule lands without an example."""

from __future__ import annotations

import math

import pytest

from clickhouse_migrator_spark.functions.select_funcs import (
    _PARAMETRIC,
    RULES,
    rewrite_functions,
)

#: spelling → (ClickHouse-flavored expression over t3, expected value
#: or ANY).  t3 is three rows: id ∈ {1,2,3}, v = id·1.5, s = 'a','b','c'.
ANY = object()

EXAMPLES: dict[str, tuple[str, object]] = {
    # ── arithmetic / comparison scalars ────────────────────────────────
    "plus": ("plus(2, 3)", 5),
    "minus": ("minus(7, 3)", 4),
    "multiply": ("multiply(6, 7)", 42),
    "divide": ("divide(7, 2)", 3.5),
    "intDiv": ("intDiv(7, 2)", 3),
    "intDivOrZero": ("intDivOrZero(7, 0)", 0),
    "modulo": ("modulo(7, 3)", 1),
    "moduloOrZero": ("moduloOrZero(7, 0)", 0),
    "negate": ("negate(5)", -5),
    "e": ("round(e(), 5)", round(math.e, 5)),
    "isNaN": ("isNaN(CAST('nan' AS DOUBLE))", True),
    "isNull": ("isNull(NULL)", True),
    "isNotNull": ("isNotNull(1)", True),
    "ifNull": ("ifNull(NULL, 9)", 9),
    "assumeNotNull": ("assumeNotNull(5)", 5),
    "multiIf": ("multiIf(1 > 2, 'a', 2 > 1, 'b', 'c')", "b"),
    # ── bit ops ────────────────────────────────────────────────────────
    "bitAnd": ("bitAnd(6, 3)", 2),
    "bitOr": ("bitOr(6, 3)", 7),
    "bitXor": ("bitXor(6, 3)", 5),
    "bitNot": ("bitNot(0)", -1),
    "bitShiftLeft": ("bitShiftLeft(1, 4)", 16),
    "bitShiftRight": ("bitShiftRight(16, 4)", 1),
    "bitCount": ("bitCount(7)", 3),
    "bitTest": ("bitTest(5, 0)", 1),
    # ── strings ────────────────────────────────────────────────────────
    "position": ("position('hello', 'll')", 3),
    "positionUTF8": ("positionUTF8('hello', 'll')", 3),
    "positionCaseInsensitive": ("positionCaseInsensitive('Hello', 'h')", 1),
    "match": ("match('abc123', '\\\\d+')", True),
    "extract": ("extract('key=val', 'key=(\\\\w+)')", "val"),
    "extractAll": ("extractAll('a1b2', '\\\\d')", ["1", "2"]),
    "countMatches": ("countMatches('a1b2c3', '\\\\d')", 3),
    "countSubstrings": ("countSubstrings('abcabc', 'bc')", 2),
    "replaceAll": ("replaceAll('aaa', 'a', 'b')", "bbb"),
    "replaceOne": ("replaceOne('aaa', 'a', 'b')", "baa"),
    "replaceRegexpAll": ("replaceRegexpAll('a1b2', '\\\\d', 'x')", "axbx"),
    "startsWith": ("startsWith('hello', 'he')", True),
    "endsWith": ("endsWith('hello', 'lo')", True),
    "ilike": ("ilike('HELLO', 'hell%')", True),
    "notLike": ("notLike('hello', 'x%')", True),
    "multiSearchAny": ("multiSearchAny('hello', ['xx', 'ell'])", True),
    "lcase": ("lcase('AbC')", "abc"),
    "ucase": ("ucase('AbC')", "ABC"),
    "lowerUTF8": ("lowerUTF8('AbC')", "abc"),
    "upperUTF8": ("upperUTF8('AbC')", "ABC"),
    "lengthUTF8": ("lengthUTF8('héllo')", 5),
    "mid": ("mid('hello', 2, 3)", "ell"),
    "substringUTF8": ("substringUTF8('hello', 2, 3)", "ell"),
    "substringIndex": ("substringIndex('a.b.c', '.', 2)", "a.b"),
    "reverseUTF8": ("reverseUTF8('abc')", "cba"),
    "trimBoth": ("trimBoth('  x  ')", "x"),
    "trimLeft": ("trimLeft('  x')", "x"),
    "trimRight": ("trimRight('x  ')", "x"),
    "leftPad": ("leftPad('7', 3, '0')", "007"),
    "rightPad": ("rightPad('7', 3, '0')", "700"),
    "concatWithSeparator": ("concatWithSeparator('-', 'a', 'b')", "a-b"),
    "splitByChar": ("splitByChar(',', 'a,b,c')", ["a", "b", "c"]),
    "splitByString": ("splitByString('::', 'a::b')", ["a", "b"]),
    "splitByWhitespace": ("splitByWhitespace('a  b')", ["a", "b"]),
    "empty": ("empty('')", True),
    "notEmpty": ("notEmpty('x')", True),
    "base64Encode": ("base64Encode('hi')", "aGk="),
    "base64Decode": ("base64Decode('aGk=')", "hi"),
    "formatReadableSize": ("formatReadableSize(1536)", "1.50 KiB"),
    "formatReadableQuantity": ("formatReadableQuantity(1500000)", "1.50 million"),
    "groupConcat": ("groupConcat(s) FROM t3", "abc"),
    # ── JSON ───────────────────────────────────────────────────────────
    "JSONExtractString": ("JSONExtractString('{\"a\": \"x\"}', 'a')", "x"),
    "JSONExtractInt": ("JSONExtractInt('{\"a\": 7}', 'a')", 7),
    "JSONExtractFloat": ("JSONExtractFloat('{\"a\": 1.5}', 'a')", 1.5),
    "JSONExtractBool": ("JSONExtractBool('{\"a\": true}', 'a')", True),
    "JSONHas": ("JSONHas('{\"a\": 1}', 'a')", True),
    "simpleJSONExtractString": (
        "simpleJSONExtractString('{\"a\": \"x\"}', 'a')",
        "x",
    ),
    "visitParamExtractString": (
        "visitParamExtractString('{\"a\": \"x\"}', 'a')",
        "x",
    ),
    # ── arrays ─────────────────────────────────────────────────────────
    "has": ("has([1, 2, 3], 2)", True),
    "hasAll": ("hasAll([1, 2, 3], [1, 3])", True),
    "hasAny": ("hasAny([1, 2], [2, 9])", True),
    "indexOf": ("indexOf([7, 8, 9], 8)", 2),
    "arrayElement": ("arrayElement([10, 20], 2)", 20),
    "arrayDistinct": ("arraySort(arrayDistinct([2, 1, 2]))", [1, 2]),
    "arraySort": ("arraySort([3, 1, 2])", [1, 2, 3]),
    "arrayReverseSort": ("arrayReverseSort([1, 3, 2])", [3, 2, 1]),
    "arrayReverse": ("arrayReverse([1, 2, 3])", [3, 2, 1]),
    "arrayConcat": ("arrayConcat([1], [2, 3])", [1, 2, 3]),
    "arraySlice": ("arraySlice([1, 2, 3, 4], 2, 2)", [2, 3]),
    "arrayPushBack": ("arrayPushBack([1, 2], 3)", [1, 2, 3]),
    "arrayPushFront": ("arrayPushFront([2, 3], 1)", [1, 2, 3]),
    "arrayPopBack": ("arrayPopBack([1, 2, 3])", [1, 2]),
    "arrayPopFront": ("arrayPopFront([1, 2, 3])", [2, 3]),
    "arrayResize": ("arrayResize([1, 2, 3], 2)", [1, 2]),
    "arrayFlatten": ("arrayFlatten([[1], [2, 3]])", [1, 2, 3]),
    "arrayCompact": ("arrayCompact([1, 1, 2, 2, 1])", [1, 2, 1]),
    "arrayIntersect": ("arraySort(arrayIntersect([1, 2, 3], [2, 3, 4]))", [2, 3]),
    "arrayJaccardIndex": ("arrayJaccardIndex([1, 2], [2, 3])", 1.0 / 3),
    "arrayStringConcat": ("arrayStringConcat(['a', 'b'], '-')", "a-b"),
    "arrayZip": ("arrayZip([1, 2], ['a', 'b'])", ANY),
    "arrayMap": ("arrayMap(x -> x * 2, [1, 2])", [2, 4]),
    "arrayFilter": ("arrayFilter(x -> x > 1, [1, 2, 3])", [2, 3]),
    "arrayExists": ("arrayExists(x -> x > 2, [1, 2, 3])", True),
    "arrayAll": ("arrayAll(x -> x > 0, [1, 2])", True),
    "arrayCount": ("arrayCount(x -> x > 1, [1, 2, 3])", 2),
    "arrayFirst": ("arrayFirst(x -> x > 1, [1, 2, 3])", 2),
    "arrayLast": ("arrayLast(x -> x > 1, [1, 2, 3])", 3),
    "arrayFirstIndex": ("arrayFirstIndex(x -> x > 1, [1, 2, 3])", 2),
    "arraySum": ("arraySum([1, 2, 3])", 6),
    "arrayProduct": ("arrayProduct([2.0, 3.0])", 6.0),
    "arrayMin": ("arrayMin([3, 1, 2])", 1),
    "arrayMax": ("arrayMax([3, 1, 2])", 3),
    "arrayAvg": ("arrayAvg([1, 2, 3])", 2.0),
    "arrayUniq": ("arrayUniq([1, 1, 2])", 2),
    "arrayCumSum": ("arrayCumSum([1, 2, 3])", [1, 3, 6]),
    "arrayDifference": ("arrayDifference([1, 4, 9])", [0, 3, 5]),
    "arrayEnumerate": ("arrayEnumerate([9, 9, 9])", [1, 2, 3]),
    "arrayEnumerateDense": ("arrayEnumerateDense([20, 10, 20])", [1, 2, 1]),
    "arrayEnumerateUniq": ("arrayEnumerateUniq([10, 10, 20])", [1, 2, 1]),
    "arrayJoin": (
        "sum(x) FROM (SELECT arrayJoin([1, 2, 3]) AS x FROM (SELECT 1) one) sub",
        6,
    ),
    "emptyArrayString": ("emptyArrayString()", []),
    "range": ("range(3)", [0, 1, 2]),
    "transform": (
        "transform(2, [1, 2], ['one', 'two'], 'other')",
        "two",
    ),
    # ── maps / tuples ──────────────────────────────────────────────────
    "mapKeys": ("arraySort(mapKeys(map('a', 1, 'b', 2)))", ["a", "b"]),
    "mapValues": ("arraySort(mapValues(map('a', 1, 'b', 2)))", [1, 2]),
    "mapContains": ("mapContains(map('a', 1), 'a')", True),
    "tuple": ("tupleElement(tuple(7, 'x'), 1)", 7),
    "tupleElement": ("tupleElement(tuple(7, 'x'), 2)", "x"),
    # ── dates / times (UTC session).  NOTE the documented type
    # divergence on the add*/subtract*/dateAdd/dateSub family: ClickHouse
    # preserves Date→Date, Spark's timestampadd widens DATE to TIMESTAMP
    # (instant-identical; renders with " 00:00:00") ──────────────────────
    "toDate": ("toString(toDate('2024-03-05 10:11:12'))", "2024-03-05"),
    "toDateTime": ("toYear(toDateTime('2024-03-05 10:11:12'))", 2024),
    "toString": ("toString(42)", "42"),
    "toYear": ("toYear(toDate('2024-03-05'))", 2024),
    "toMonth": ("toMonth(toDate('2024-03-05'))", 3),
    "toQuarter": ("toQuarter(toDate('2024-05-05'))", 2),
    "toDayOfMonth": ("toDayOfMonth(toDate('2024-03-05'))", 5),
    "toDayOfWeek": ("toDayOfWeek(toDate('2024-03-05'))", 2),  # Tuesday
    "toDayOfYear": ("toDayOfYear(toDate('2024-02-01'))", 32),
    "toHour": ("toHour(toDateTime('2024-03-05 10:11:12'))", 10),
    "toMinute": ("toMinute(toDateTime('2024-03-05 10:11:12'))", 11),
    "toSecond": ("toSecond(toDateTime('2024-03-05 10:11:12'))", 12),
    "toISOWeek": ("toISOWeek(toDate('2024-01-04'))", 1),
    "toISOYear": ("toISOYear(toDate('2024-01-01'))", 2024),
    "toWeek": ("toWeek(toDate('2024-01-10'))", ANY),
    "toMonday": ("toString(toMonday(toDate('2024-03-05')))", "2024-03-04"),
    "toStartOfDay": (
        "toString(toStartOfDay(toDateTime('2024-03-05 10:11:12')))",
        "2024-03-05 00:00:00",
    ),
    "toStartOfHour": (
        "toString(toStartOfHour(toDateTime('2024-03-05 10:11:12')))",
        "2024-03-05 10:00:00",
    ),
    "toStartOfMinute": (
        "toString(toStartOfMinute(toDateTime('2024-03-05 10:11:45')))",
        "2024-03-05 10:11:00",
    ),
    "toStartOfFifteenMinutes": (
        "toString(toStartOfFifteenMinutes(toDateTime('2024-03-05 10:22:00')))",
        "2024-03-05 10:15:00",
    ),
    "toStartOfTenMinutes": (
        "toString(toStartOfTenMinutes(toDateTime('2024-03-05 10:27:00')))",
        "2024-03-05 10:20:00",
    ),
    "toStartOfMonth": ("toString(toStartOfMonth(toDate('2024-03-05')))", "2024-03-01"),
    "toStartOfQuarter": ("toString(toStartOfQuarter(toDate('2024-05-05')))", "2024-04-01"),
    "toStartOfYear": ("toString(toStartOfYear(toDate('2024-03-05')))", "2024-01-01"),
    "toLastDayOfMonth": ("toString(toLastDayOfMonth(toDate('2024-02-05')))", "2024-02-29"),
    "toYYYYMM": ("toYYYYMM(toDate('2024-03-05'))", 202403),
    "toYYYYMMDD": ("toYYYYMMDD(toDate('2024-03-05'))", 20240305),
    "toYYYYMMDDhhmmss": (
        "toYYYYMMDDhhmmss(toDateTime('2024-03-05 10:11:12'))",
        20240305101112,
    ),
    "toUnixTimestamp": ("toUnixTimestamp(toDateTime('1970-01-01 00:01:00'))", 60),
    "fromUnixTimestamp": ("toString(fromUnixTimestamp(60))", "1970-01-01 00:01:00"),
    "toRelativeDayNum": ("toRelativeDayNum(toDate('1970-01-03'))", 2),
    "toRelativeHourNum": (
        "toRelativeHourNum(toDateTime('1970-01-01 05:00:00'))",
        5,
    ),
    "toRelativeMinuteNum": (
        "toRelativeMinuteNum(toDateTime('1970-01-01 00:30:00'))",
        30,
    ),
    "toModifiedJulianDay": ("toModifiedJulianDay('1858-11-17')", 0),
    "addDays": ("toString(addDays(toDate('2024-03-05'), 3))", "2024-03-08 00:00:00"),
    "addWeeks": ("toString(addWeeks(toDate('2024-03-05'), 1))", "2024-03-12 00:00:00"),
    "addMonths": ("toString(addMonths(toDate('2024-01-31'), 1))", "2024-02-29 00:00:00"),
    "addQuarters": ("toString(addQuarters(toDate('2024-01-05'), 1))", "2024-04-05 00:00:00"),
    "addYears": ("toString(addYears(toDate('2024-03-05'), 1))", "2025-03-05 00:00:00"),
    "addHours": (
        "toString(addHours(toDateTime('2024-03-05 10:00:00'), 2))",
        "2024-03-05 12:00:00",
    ),
    "addMinutes": (
        "toString(addMinutes(toDateTime('2024-03-05 10:00:00'), 30))",
        "2024-03-05 10:30:00",
    ),
    "addSeconds": (
        "toString(addSeconds(toDateTime('2024-03-05 10:00:00'), 45))",
        "2024-03-05 10:00:45",
    ),
    "subtractDays": ("toString(subtractDays(toDate('2024-03-05'), 4))", "2024-03-01 00:00:00"),
    "subtractWeeks": ("toString(subtractWeeks(toDate('2024-03-15'), 1))", "2024-03-08 00:00:00"),
    "subtractMonths": ("toString(subtractMonths(toDate('2024-03-31'), 1))", "2024-02-29 00:00:00"),
    "subtractQuarters": ("toString(subtractQuarters(toDate('2024-04-05'), 1))", "2024-01-05 00:00:00"),
    "subtractYears": ("toString(subtractYears(toDate('2024-03-05'), 1))", "2023-03-05 00:00:00"),
    "subtractHours": (
        "toString(subtractHours(toDateTime('2024-03-05 10:00:00'), 2))",
        "2024-03-05 08:00:00",
    ),
    "subtractMinutes": (
        "toString(subtractMinutes(toDateTime('2024-03-05 10:30:00'), 30))",
        "2024-03-05 10:00:00",
    ),
    "subtractSeconds": (
        "toString(subtractSeconds(toDateTime('2024-03-05 10:00:45'), 45))",
        "2024-03-05 10:00:00",
    ),
    "dateAdd": ("toString(dateAdd(DAY, 3, toDate('2024-03-05')))", "2024-03-08 00:00:00"),
    "dateSub": ("toString(dateSub(DAY, 4, toDate('2024-03-05')))", "2024-03-01 00:00:00"),
    "dateDiff": (
        "dateDiff('day', toDate('2024-03-01'), toDate('2024-03-05'))",
        4,
    ),
    "timeDiff": (
        "timeDiff(toDateTime('2024-03-05 10:00:00'), toDateTime('2024-03-05 10:01:40'))",
        100,
    ),
    "age": ("age('day', toDate('2024-03-01'), toDate('2024-03-05'))", 4),
    "dateName": ("dateName('month', toDate('2024-03-05'))", "March"),
    "timeSlot": (
        "toString(timeSlot(toDateTime('2024-03-05 10:44:00')))",
        "2024-03-05 10:30:00",
    ),
    "formatDateTime": (
        "formatDateTime(toDateTime('2024-03-05 07:08:09'), '%Y-%m-%d %H:%i:%S')",
        "2024-03-05 07:08:09",
    ),
    "parseDateTimeBestEffort": (
        "toYear(parseDateTimeBestEffort('2024-03-05T10:11:12'))",
        2024,
    ),
    "now": ("toYear(now()) >= 2024", True),
    "now64": ("toYear(now64()) >= 2024", True),
    "today": ("toYear(today()) >= 2024", True),
    "yesterday": ("dateDiff('day', yesterday(), today())", 1),
    "toIntervalDay": ("toString(toDate('2024-03-05') + toIntervalDay(3))", "2024-03-08"),
    "toIntervalWeek": ("toString(toDate('2024-03-05') + toIntervalWeek(1))", "2024-03-12"),
    "toIntervalMonth": ("toString(toDate('2024-01-05') + toIntervalMonth(1))", "2024-02-05"),
    "toIntervalYear": ("toString(toDate('2024-03-05') + toIntervalYear(1))", "2025-03-05"),
    "toIntervalHour": (
        "toString(toDateTime('2024-03-05 10:00:00') + toIntervalHour(2))",
        "2024-03-05 12:00:00",
    ),
    "toIntervalMinute": (
        "toString(toDateTime('2024-03-05 10:00:00') + toIntervalMinute(5))",
        "2024-03-05 10:05:00",
    ),
    "toIntervalSecond": (
        "toString(toDateTime('2024-03-05 10:00:00') + toIntervalSecond(5))",
        "2024-03-05 10:00:05",
    ),
    # ── casts ──────────────────────────────────────────────────────────
    "toInt8": ("toInt8('7')", 7),
    "toInt16": ("toInt16('300')", 300),
    "toInt32": ("toInt32('70000')", 70000),
    "toInt64": ("toInt64('7')", 7),
    "toUInt8": ("toUInt8('7')", 7),
    "toUInt16": ("toUInt16('300')", 300),
    "toUInt32": ("toUInt32('70000')", 70000),
    "toUInt64": ("toUInt64('7')", 7),
    "toFloat32": ("toFloat32('1.5')", 1.5),
    "toFloat64": ("toFloat64('1.5')", 1.5),
    "toDecimal32": ("toString(toDecimal32('1.5', 2))", "1.50"),
    "toDecimal64": ("toString(toDecimal64('1.5', 2))", "1.50"),
    "toDecimal128": ("toString(toDecimal128('1.5', 2))", "1.50"),
    "roundBankers": ("roundBankers(2.5)", 2.0),
    # ── misc scalars ───────────────────────────────────────────────────
    "rand": ("rand() >= 0", True),
    "rand64": ("rand64() IS NOT NULL", True),
    "generateUUIDv4": ("length(toString(generateUUIDv4()))", 36),
    "currentDatabase": ("length(currentDatabase()) > 0", True),
    "currentUser": ("currentUser() IS NOT NULL", True),
    "geoDistance": (
        "round(geoDistance(0.0, 0.0, 0.0, 1.0) / 1000)",
        ANY,  # ~111 km; engines differ on the exact radius model
    ),
    "greatCircleDistance": (
        "greatCircleDistance(0.0, 0.0, 0.0, 1.0) > 100000",
        True,
    ),
    # ── aggregates (FROM t3: id ∈ {1,2,3}, v = id*1.5, s = a/b/c) ──────
    "any": ("any(id) FROM t3", ANY),
    "anyHeavy": ("anyHeavy(id) FROM t3", ANY),
    "anyLast": ("anyLast(id) FROM t3", ANY),
    "anyIf": ("anyIf(id, id = 2) FROM t3", 2),
    "argMax": ("argMax(s, id) FROM t3", "c"),
    "argMin": ("argMin(s, id) FROM t3", "a"),
    "argMaxIf": ("argMaxIf(s, id, id < 3) FROM t3", "b"),
    "argMinIf": ("argMinIf(s, id, id > 1) FROM t3", "b"),
    "avgIf": ("avgIf(id, id > 1) FROM t3", 2.5),
    "avgOrNull": ("avgOrNull(id) FROM t3 WHERE id > 9", None),
    "avgOrDefault": ("avgOrDefault(id) FROM t3 WHERE id > 9", 0.0),
    "avgWeighted": ("avgWeighted(id, id) FROM t3", 14.0 / 6),
    "sumIf": ("sumIf(id, id > 1) FROM t3", 5),
    "sumOrNull": ("sumOrNull(id) FROM t3 WHERE id > 9", None),
    "sumOrDefault": ("sumOrDefault(id) FROM t3 WHERE id > 9", 0),
    "minIf": ("minIf(id, id > 1) FROM t3", 2),
    "minOrNull": ("minOrNull(id) FROM t3 WHERE id > 9", None),
    "minOrDefault": ("minOrDefault(id) FROM t3 WHERE id > 9", 0),
    "maxIf": ("maxIf(id, id < 3) FROM t3", 2),
    "maxOrNull": ("maxOrNull(id) FROM t3 WHERE id > 9", None),
    "maxOrDefault": ("maxOrDefault(id) FROM t3 WHERE id > 9", 0),
    "countIf": ("countIf(id > 1) FROM t3", 2),
    "countOrNull": ("countOrNull(id) FROM t3 WHERE id > 9", None),
    "countDistinctIf": ("countDistinctIf(id % 2, id >= 1) FROM t3", 2),
    "uniq": ("uniq(id % 2) FROM t3", 2),
    "uniqExact": ("uniqExact(id % 2) FROM t3", 2),
    "uniqExactIf": ("uniqExactIf(id % 2, id > 0) FROM t3", 2),
    "uniqIf": ("uniqIf(id % 2, id > 0) FROM t3", 2),
    "uniqCombined": ("uniqCombined(id) FROM t3", 3),
    "uniqCombined64": ("uniqCombined64(id) FROM t3", 3),
    "uniqHLL12": ("uniqHLL12(id) FROM t3", ANY),  # approx
    "uniqArray": ("uniqArray([id, id + 10]) AS ua FROM t3", 6),
    "groupArrayArray": (
        "arraySort(groupArrayArray([id])) FROM t3",
        [1, 2, 3],
    ),
    "groupArrayIf": ("arraySort(groupArrayIf(id, id > 1)) FROM t3", [2, 3]),
    "groupUniqArray": ("arraySort(groupUniqArray(id % 2)) FROM t3", [0, 1]),
    "groupUniqArrayIf": (
        "arraySort(groupUniqArrayIf(id % 2, id > 0)) FROM t3",
        [0, 1],
    ),
    "sumArray": ("sumArray([v, 1.0]) FROM t3", 12.0),
    "countArray": ("countArray([id, id]) FROM t3", 6),
    "minArray": ("minArray([id, id + 10]) FROM t3", 1),
    "maxArray": ("maxArray([id, id + 10]) FROM t3", 13),
    "avgArray": ("avgArray([2.0, 4.0]) FROM t3", 3.0),
    "corrIf": ("round(corrIf(id, v, id > 0), 4) FROM t3", 1.0),
    "covarPop": ("round(covarPop(id, v), 4) FROM t3", 1.0),
    "covarSamp": ("round(covarSamp(id, v), 4) FROM t3", 1.5),
    "stddevPop": ("round(stddevPop(v), 4) FROM t3", round((1.5 ** 2 * 2 / 3) ** 0.5, 4)),
    "stddevSamp": ("round(stddevSamp(id), 4) FROM t3", 1.0),
    "stddevPopIf": ("round(stddevPopIf(id, id > 0), 4) FROM t3", round((2.0 / 3) ** 0.5, 4)),
    "stddevSampIf": ("stddevSampIf(id, id > 0) FROM t3", 1.0),
    "varPop": ("round(varPop(id), 4) FROM t3", round(2.0 / 3, 4)),
    "varSamp": ("varSamp(id) FROM t3", 1.0),
    "varPopIf": ("round(varPopIf(id, id > 0), 4) FROM t3", round(2.0 / 3, 4)),
    "varSampIf": ("varSampIf(id, id > 0) FROM t3", 1.0),
    "skewPop": ("round(skewPop(id), 4) FROM t3", 0.0),
    "kurtPop": ("round(kurtPop(id), 4) FROM t3", 1.5),
    "medianIf": ("medianIf(id, id > 0) FROM t3", 2.0),
    # ── window-frame spellings ─────────────────────────────────────────
    "lagInFrame": (
        "max(lg) FROM (SELECT lagInFrame(id) OVER (ORDER BY id) AS lg FROM t3) x",
        2,
    ),
    "leadInFrame": (
        "max(ld) FROM (SELECT leadInFrame(id) OVER (ORDER BY id) AS ld FROM t3) x",
        3,
    ),
    # ── parametric aggregates ──────────────────────────────────────────
    "median": ("median(id) FROM t3", 2.0),
    "medianExact": ("medianExact(id) FROM t3", 2.0),
    "quantile": ("quantile(0.5)(id) FROM t3", 2.0),
    "quantileExact": ("quantileExact(0.5)(id) FROM t3", 2.0),
    "quantileIf": ("quantileIf(0.5)(id, id > 0) FROM t3", 2.0),
    "quantileExactIf": ("quantileExactIf(0.5)(id, id > 0) FROM t3", 2.0),
    "quantileDeterministic": ("quantileDeterministic(0.5)(id, id) FROM t3", 2.0),
    "quantileTDigest": ("quantileTDigest(0.5)(id) FROM t3", ANY),  # approx
    "quantileTiming": ("quantileTiming(0.5)(id) FROM t3", ANY),
    "quantiles": ("quantiles(0.0, 1.0)(id) FROM t3", [1.0, 3.0]),
    "groupArray": ("arraySort(groupArray(id)) FROM t3", [1, 2, 3]),
    "groupArraySample": ("groupArraySample(2)(id) FROM t3", ANY),
    "uniqUpTo": ("uniqUpTo(5)(id) FROM t3", 3),
}


def _norm(v):
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, float):
        return round(v, 6)
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 6)
    return v


def test_every_spelling_has_an_example():
    missing = sorted((set(RULES) | set(_PARAMETRIC)) - set(EXAMPLES))
    assert missing == [], f"spellings with no execution example: {missing}"


def test_no_stale_examples():
    stale = sorted(set(EXAMPLES) - (set(RULES) | set(_PARAMETRIC)))
    assert stale == [], f"examples for unknown spellings: {stale}"


def test_rewrite_is_idempotent_on_all_examples():
    """rewrite(rewrite(x)) == rewrite(x) for every example — a rule
    whose OUTPUT re-matches any spelling (the round-6 rand bug class)
    fails here without needing Spark."""
    bad = []
    for name in sorted(EXAMPLES):
        expr, _ = EXAMPLES[name]
        stmt = (
            f"SELECT {expr}" if " FROM " in expr else f"SELECT {expr} FROM t3 LIMIT 1"
        )
        once = rewrite_functions(stmt)
        twice = rewrite_functions(once)
        if twice != once:
            bad.append(f"{name}: {once[:100]} -> {twice[:100]}")
    assert not bad, "\n".join(bad)


@pytest.fixture
def t3_view(spark):
    spark.range(1, 4).selectExpr(
        "id", "id * 1.5 AS v", "char(96 + id) AS s"
    ).createOrReplaceTempView("t3")
    yield
    # migrate.show_tables lists temp views too — don't leak t3 into
    # later test files (the suite's shared session)
    spark.catalog.dropTempView("t3")


def test_all_spellings_execute(spark, t3_view):
    """One pass over all 283 examples (a parametrized variant costs
    ~1.5 s of pytest/Spark overhead per case ≈ 7 minutes; this loop
    runs in under a minute and reports every failure at once)."""
    failures = []
    for name in sorted(EXAMPLES):
        expr, want = EXAMPLES[name]
        stmt = (
            f"SELECT {expr}" if " FROM " in expr else f"SELECT {expr} FROM t3 LIMIT 1"
        )
        sql = rewrite_functions(stmt)
        try:
            row = spark.sql(sql).first()
        except Exception as e:
            failures.append(f"{name}: EXEC ERROR {str(e)[:160]} | {sql[:160]}")
            continue
        if want is not ANY:
            got = _norm(row[0])
            if got != _norm(want):
                failures.append(f"{name}: got {got!r} want {want!r} | {sql[:160]}")
    assert not failures, "\n".join(failures)
