"""Golden SBS-1 wire lines from the reference README (README.md:82-94).

Covers all 6 message types and all 8 MSG transmission subtypes, plus the
documented edge cases (FIXTURES.md §A1): short non-MSG forms, decimal
ground_speed/track, empty fields, leading-zero squawk.
"""

SAMPLE_LINES = [
    "SEL,,496,2286,4CA4E5,27215,2010/02/19,18:06:07.710,2010/02/19,18:06:07.710,RYR1427",
    "ID,,496,7162,405637,27928,2010/02/19,18:06:07.115,2010/02/19,18:06:07.115,EZY691A",
    "AIR,,496,5906,400F01,27931,2010/02/19,18:06:07.128,2010/02/19,18:06:07.128",
    "STA,,5,179,400AE7,10103,2008/11/28,14:58:51.153,2008/11/28,14:58:51.153,RM",
    "CLK,,496,-1,,-1,2010/02/19,18:18:19.036,2010/02/19,18:18:19.036",
    "MSG,1,145,256,7404F2,11267,2008/11/28,23:48:18.611,2008/11/28,23:53:19.161,RJA1118,,,,,,,,,,,",
    "MSG,2,496,603,400CB6,13168,2008/10/13,12:24:32.414,2008/10/13,12:28:52.074,,,0,76.4,258.3,54.05735,-4.38826,,,,,,0",
    "MSG,3,496,211,4CA2D6,10057,2008/11/28,14:53:50.594,2008/11/28,14:58:51.153,,37000,,,51.45735,-1.02826,,,0,0,0,0",
    "MSG,4,496,469,4CA767,27854,2010/02/19,17:58:13.039,2010/02/19,17:58:13.368,,,288.6,103.2,,,-832,,,,,",
    "MSG,5,496,329,394A65,27868,2010/02/19,17:58:12.644,2010/02/19,17:58:13.368,,10000,,,,,,,0,,0,0",
    "MSG,6,496,237,4CA215,27864,2010/02/19,17:58:12.846,2010/02/19,17:58:13.368,,33325,,,,,,0271,0,0,0,0",
    "MSG,7,496,742,51106E,27929,2011/03/06,07:57:36.523,2011/03/06,07:57:37.054,,3775,,,,,,,,,,0",
    "MSG,8,496,194,405F4E,27884,2010/02/19,17:58:13.244,2010/02/19,17:58:13.368,,,,,,,,,,,,0",
]

# 22-field MSG lines surviving the width filter (F-4). Note: the README's
# MSG,2 sample line (README.md:88) actually has 23 fields, so the
# reference's ``len(line) == 22`` check (dump1090-postgres.py:102) drops it
# as well — faithful parsers keep 7 of the 8 MSG samples.
N_MSG_LINES = 7

# Synthetic 22-field MSG,2 line (not from the README) carrying decimal
# ground_speed/track — exercises the F-8 integer-coercion path that the
# reference's 22P02 handler covers (dump1090-postgres.py:118-123).
DECIMAL_SPEED_LINE = (
    "MSG,2,496,603,400CB6,13168,2008/10/13,12:24:32.414,2008/10/13,"
    "12:28:52.074,,,76.4,258.3,54.05735,-4.38826,,,,,,0"
)
