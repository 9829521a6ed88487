#pragma once
#ifndef BOOST_GPU_ENABLED
#define BOOST_GPU_ENABLED
#endif
