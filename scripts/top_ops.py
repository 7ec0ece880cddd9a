"""Parse a JAX profiler xplane trace and print top TPU ops by total duration."""
import collections
import glob
import sys

try:
    from tensorboard_plugin_profile.protobuf import xplane_pb2
except ImportError:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore


def main(trace_dir="/tmp/mti_trace"):
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    durations = collections.Counter()
    counts = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                durations[name] += ev.duration_ps / 1e9  # ms
                counts[name] += 1
    total = sum(durations.values())
    print(f"total device time: {total:.1f} ms over {sum(counts.values())} events")
    for name, ms in durations.most_common(30):
        print(f"{ms:9.2f} ms  x{counts[name]:<4} {name[:110]}")


if __name__ == "__main__":
    main(*sys.argv[1:])
