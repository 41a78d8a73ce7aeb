#!/bin/bash
# Compiles the REFERENCE HLL++ core (unmodified sources from
# /root/reference) against compile shims (see shims/ — plumbing only, no
# sketch logic) and regenerates tools/refgolden/ref_state_golden.tsv.
set -euo pipefail
cd "$(dirname "$0")"
BUILD=build
rm -rf "$BUILD"
mkdir -p "$BUILD/src/com/google/zetasketch/internal/hllplus" \
         "$BUILD/src/com/google/zetasketch/internal/hash"
REF=/root/reference/java/com/google/zetasketch
cp "$REF"/internal/hllplus/{State,Representation,NormalRepresentation,SparseRepresentation,Encoding,Data}.java \
   "$BUILD/src/com/google/zetasketch/internal/hllplus/"
cp "$REF"/internal/{ByteSlice,GrowingByteSlice,VarInt,DifferenceEncoder,DifferenceDecoder,MergedIntIterator}.java \
   "$BUILD/src/com/google/zetasketch/internal/"
cp "$REF"/internal/hash/Hash.java "$BUILD/src/com/google/zetasketch/internal/hash/"
cp "$REF"/IncompatiblePrecisionException.java "$BUILD/src/com/google/zetasketch/"
cp -r shims/* "$BUILD/src/"
cp GenStateGolden.java "$BUILD/src/"
GUAVA=$(ls /opt/spark-*/jars/guava-*.jar | head -1)
FAIL=$(ls /opt/spark-*/jars/failureaccess-*.jar 2>/dev/null | head -1 || true)
CP="$GUAVA${FAIL:+:$FAIL}"
javac -nowarn -encoding UTF-8 -cp "$CP" -d "$BUILD/classes" $(find "$BUILD/src" -name '*.java')
java -cp "$BUILD/classes:$CP" GenStateGolden > ref_state_golden.tsv
wc -l ref_state_golden.tsv
