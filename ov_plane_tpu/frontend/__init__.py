"""Vision frontend: pyramidal KLT tracking, FAST detection, plane detection.

TPU-native re-design of the reference's OpenCV-based ``TrackPlane`` frontend
(track_plane/TrackPlane.cpp): image pyramids, Lucas-Kanade flow, FAST corners
and the Delaunay-normal plane clustering are batched JAX ops (vmapped over
features), with the Delaunay triangulation itself on the host (native C++,
ov_plane_tpu.native).
"""
