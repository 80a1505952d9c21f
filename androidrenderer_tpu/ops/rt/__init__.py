"""Ray tracing — wavefront BVH traversal + RT shadows / RTAO / RTGI
(directional_light.cpp:372-422, ambient_occlusion_phase.cpp:357-397,
gi/rtgi.cpp:69-188)."""
